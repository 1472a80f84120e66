"""Leaf-sharded IVF search over a device mesh (tree + IndexShards).

The single-device tree backend (ops/ivf.py) partitions the bank into
fixed-capacity leaf slabs. Multi-chip, the slabs themselves shard over
the mesh's bank axis (shard s owns leaves [s*Ls, (s+1)*Ls)):

- queries are globally sorted by top-1 leaf (replicated centroids) for
  tile coherence, then replicated to every shard;
- each shard computes a per-tile shortlist of its LOCAL top-ceil(L/p)
  leaves and scans them with the IVF kernel — so the global probe
  budget L spreads across shards and every shard does identical-shape
  work (no ragged "how many of the global top-L live here" problem);
- the per-shard top-k merge + masked-psum label fetch is the same
  gather strategy as the flat sharded search
  (parallel/sharded_knn.sharded_knn_with_labels).

Total scanned rows stay ~L*cap; coverage is at least as wide as the
single-device shortlist whenever leaves distribute evenly (the forced
per-shard spread can only add leaves beyond the global top-L).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hbird_tpu.ops.ivf import (
    coherent_query_order,
    ivf_search_xla,
    pallas_ivf_knn,
    select_block_leaves,
)
from hbird_tpu.ops.knn_pallas import _round_up


def shard_ivf_state(ivf_bank, ivf_labels, mesh: Mesh, bank_axis: str = "bank"):
    """Place PREBUILT leaf-contiguous arrays row-sharded over the bank
    axis — the companion to `NearestNeighborSearchApprox.from_tree_state`
    when injecting externally-built/persisted slabs into a meshed
    backend. (In-engine meshed builds go through build_ivf_sharded below
    and never need this.) Slab boundaries align with shard boundaries
    because the tree geometry rounds n_leaves to a multiple of the axis
    size."""
    spec = NamedSharding(mesh, P(bank_axis))
    return jax.device_put(ivf_bank, spec), jax.device_put(ivf_labels, spec)


def sharded_ivf_knn_with_labels(
    queries: jax.Array,
    ivf_bank: jax.Array,
    ivf_labels: jax.Array,
    centroids: jax.Array,
    leaf_valid: jax.Array,
    k: int,
    *,
    mesh: Mesh,
    bank_axis: str = "bank",
    cap: int,
    n_probe: int,
    block_q: int = 256,
    sort_queries: bool = True,
    kernel: str = "auto",
    interpret: Optional[bool] = None,
    shard_probe: str = "split",
    row_scale: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Tree search over a leaf-sharded mesh.

    row_scale: optional (n_leaves*cap,) or (n_slots, 1) f32 per-slot
    dequant scales for an int8 slab bank (SQ8), sharded like ivf_bank.

    Args:
        queries: (Q, D), replicated.
        ivf_bank / ivf_labels: (n_leaves*cap, D) / (n_leaves*cap, C),
            row-sharded over `bank_axis`.
        centroids: (n_leaves, D) f32, replicated (1.5 MB at 512x768 —
            each shard slices its local rows).
        leaf_valid: (n_leaves,) int32, replicated.
        k / cap / n_probe / block_q: tree-search geometry.
        shard_probe: how the probe budget maps onto shards —
            'split' (default): each shard probes its local
            top-ceil(n_probe/p) leaves, so total scanned rows stay
            ~n_probe*cap. When probe-worthy leaves concentrate on one
            shard (skewed query distributions) recall can differ from
            single-chip at the same n_probe, because another shard's
            forced picks replace globally-better leaves.
            'full': each shard probes its local top-min(n_probe,
            local_leaves) leaves — a superset of the single-chip
            shortlist, so recall >= single-chip at the same n_probe, at
            up to p× the scan cost.

    Returns:
        (values (Q, k) f32, indices (Q, k) int32 IVF-layout slot ids,
        neighbour labels (Q, k, C)) — replicated.
    """
    p = mesh.shape[bank_axis]
    n_slots, d = ivf_bank.shape
    n_leaves = n_slots // cap
    assert n_leaves % p == 0, (n_leaves, p)
    local_leaves = n_leaves // p
    local_slots = n_slots // p
    if shard_probe not in ("split", "full"):
        raise ValueError(f"shard_probe must be 'split' or 'full': {shard_probe}")
    per_shard = n_probe if shard_probe == "full" else -(-n_probe // p)
    l_p = min(max(1, per_shard), local_leaves)
    if kernel == "auto":
        kernel = "pallas" if jax.default_backend() == "tpu" else "xla"

    order = inv = None
    if sort_queries:
        order = coherent_query_order(queries, centroids)
        inv = jnp.argsort(order)
        queries = queries[order]
    q_n = queries.shape[0]
    q_pad = _round_up(q_n, block_q)
    if q_pad != q_n:
        # Edge padding: see ops/ivf.ivf_search — zero pad rows would
        # distort the last tile's leaf shortlist.
        queries = jnp.pad(queries, ((0, q_pad - q_n), (0, 0)), mode="edge")

    def local_search(q, bank_l, labels_l, cent, lv, *extra):
        i = jax.lax.axis_index(bank_axis)
        cent_l = jax.lax.dynamic_slice(
            cent, (i * local_leaves, 0), (local_leaves, d)
        )
        lv_l = jax.lax.dynamic_slice(lv, (i * local_leaves,), (local_leaves,))
        rs_l = extra[0].reshape(-1) if extra else None
        lids = select_block_leaves(q, cent_l, l_p, block_q)
        if kernel == "pallas":
            vals_l, idx_l = pallas_ivf_knn(
                q, bank_l, lids, lv_l, k, cap=cap, block_q=block_q,
                interpret=interpret, row_scale=rs_l,
            )
        else:
            vals_l, idx_l = ivf_search_xla(
                q, bank_l, lids, lv_l, k, cap=cap, row_scale=rs_l
            )
        start = (i * local_slots).astype(jnp.int32)
        gidx_l = idx_l + start

        # Gather the tiny per-shard candidate lists everywhere, merge.
        vals_g = jax.lax.all_gather(vals_l, bank_axis)  # (p, Q, k)
        gidx_g = jax.lax.all_gather(gidx_l, bank_axis)
        qq = vals_g.shape[1]
        cand_vals = vals_g.transpose(1, 0, 2).reshape(qq, p * k)
        cand_idx = gidx_g.transpose(1, 0, 2).reshape(qq, p * k)
        merged_vals, sel = jax.lax.top_k(cand_vals, k)
        merged_idx = jnp.take_along_axis(cand_idx, sel, axis=-1)

        # Label fetch via masked psum: only the owning shard contributes.
        mine = (merged_idx >= start) & (merged_idx < start + local_slots)
        rows = jnp.where(mine, merged_idx - start, 0)
        contrib = jnp.where(
            mine[..., None], jnp.take(labels_l, rows, axis=0), 0.0
        )
        merged_labels = jax.lax.psum(contrib, bank_axis)
        return merged_vals, merged_idx, merged_labels

    in_specs = [P(None, None), P(bank_axis), P(bank_axis), P(None, None),
                P(None)]
    args = [queries, ivf_bank, ivf_labels, centroids,
            jnp.asarray(leaf_valid, jnp.int32)]
    if row_scale is not None:
        in_specs.append(P(bank_axis))
        args.append(row_scale.reshape(-1))
    fn = jax.shard_map(
        local_search,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    vals, idx, labels = fn(*args)
    vals, idx, labels = vals[:q_n], idx[:q_n], labels[:q_n]
    if inv is not None:
        vals, idx, labels = vals[inv], idx[inv], labels[inv]
    return vals, idx, labels


# ----------------------------------------------------------------------
# Distributed tree BUILD (round 3): no single-device materialization of
# the full bank anywhere in the pipeline. The bank lives row-sharded
# over the mesh's bank axis from placement to leaf slabs:
#
#   1. k-means over the FULL sharded bank: shard-local assign + psum'd
#      per-centroid sums/counts (sharded_kmeans) — Lloyd's over ICI.
#   2. leaf assignment: shard-local argmax passes (sharded_assign_leaves);
#      only the tiny (M, A) choices/scores land on host.
#   3. balanced layout: the SAME host greedy as the single-device build
#      (ops/ivf.balanced_layout) on those host-side choices — slot
#      placement is bit-identical to an unsharded build.
#   4. physical placement: a ppermute RING over the bank axis
#      (ring_scatter_build). Each shard's rows visit every shard once;
#      the owner scatters the rows destined for its leaf slab. Peak
#      per-shard memory: ~3 row-shards + its slab; never the full bank.
# ----------------------------------------------------------------------
def _pad_rows_to(arr, rows):
    if arr.shape[0] == rows:
        return arr
    pad = [(0, rows - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return (
        jnp.pad(arr, pad) if isinstance(arr, jax.Array) else np.pad(arr, pad)
    )


def shard_rows(arr, mesh: Mesh, bank_axis: str = "bank"):
    """Place (M, ...) host or device rows row-sharded over `bank_axis`,
    zero-padding M up to a multiple of the axis size. Returns
    (sharded array, original M).

    Multi-process safe: every process holds the same global host view
    and materializes only its addressable shards
    (make_array_from_callback) — device_put cannot target
    non-addressable devices on a multi-host mesh."""
    p = mesh.shape[bank_axis]
    m = arr.shape[0]
    r = _round_up(m, p)
    arr = _pad_rows_to(arr, r)
    sharding = NamedSharding(mesh, P(bank_axis))
    if isinstance(arr, jax.Array) and jax.process_count() > 1:
        if arr.is_fully_addressable:
            # A process-local device array (e.g. an injected int8 bank):
            # same contract as host input — every process holds the same
            # view; pull to host and build the global array shard-wise.
            arr = np.asarray(arr)
        else:
            # Already a global array: reshard through jit — device_put
            # cannot target non-addressable devices on a multi-host mesh,
            # but GSPMD resharding can.
            return jax.jit(lambda x: x, out_shardings=sharding)(arr), m
    if isinstance(arr, jax.Array):
        sharded = jax.device_put(arr, sharding)
    else:
        arr_np = np.asarray(arr)
        sharded = jax.make_array_from_callback(
            arr_np.shape, sharding, lambda idx: arr_np[idx]
        )
    return sharded, m


def sharded_kmeans(
    bank_sharded: jax.Array,
    init_centroids: jax.Array,
    mesh: Mesh,
    *,
    iters: int = 4,
    bank_axis: str = "bank",
    valid_rows: Optional[int] = None,
    spherical: bool = True,
) -> jax.Array:
    """Lloyd's k-means over the full row-sharded bank.

    Shard-local MXU assignment + one psum of per-centroid (sums, counts)
    per iteration — the distributed twin of ops/ivf.train_centroids
    (which runs on a replicated sample). Padding rows carry zero weight.

    Returns (n_leaves, D) f32 centroids, replicated.
    """
    n_leaves, d = init_centroids.shape
    r, d2 = bank_sharded.shape
    assert d == d2, (init_centroids.shape, bank_sharded.shape)
    m = valid_rows if valid_rows is not None else r
    p = mesh.shape[bank_axis]
    local = r // p

    def body(x_l, w_l, c0):
        x32 = x_l.astype(jnp.float32)

        def step(c, _):
            a = jnp.argmax(x32 @ c.T, axis=1)
            sums = jax.ops.segment_sum(
                x32 * w_l[:, None], a, num_segments=n_leaves
            )
            cnt = jax.ops.segment_sum(w_l, a, num_segments=n_leaves)
            sums = jax.lax.psum(sums, bank_axis)
            cnt = jax.lax.psum(cnt, bank_axis)[:, None]
            newc = jnp.where(cnt > 0, sums / jnp.maximum(cnt, 1.0), c)
            if spherical:
                newc = newc / jnp.maximum(
                    jnp.linalg.norm(newc, axis=1, keepdims=True), 1e-12
                )
            return newc, None

        c, _ = jax.lax.scan(step, c0, None, length=iters)
        return c

    # Row weights: 1 for real rows, 0 for the shard-padding tail.
    # (Global-array construction keeps this multi-process safe.)
    w_np = (np.arange(r) < m).astype(np.float32)
    weights = jax.make_array_from_callback(
        (r,), NamedSharding(mesh, P(bank_axis)), lambda idx: w_np[idx]
    )
    c_np = np.asarray(init_centroids, np.float32)
    c0 = jax.make_array_from_callback(
        c_np.shape, NamedSharding(mesh, P()), lambda idx: c_np[idx]
    )
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(bank_axis), P(bank_axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(bank_sharded, weights, c0)


def sharded_assign_leaves(
    bank_sharded: jax.Array,
    centroids: jax.Array,
    mesh: Mesh,
    *,
    n_choices: int = 3,
    bank_axis: str = "bank",
    chunk_rows: int = 1 << 16,
    replicate_out: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-`n_choices` leaf ids + scores per row, computed shard-locally
    (lax.scan over row chunks inside shard_map so the (rows, n_leaves)
    score block never exceeds chunk_rows x n_leaves per shard).

    Returns host (R, A) int32 choices and (R, A) f32 scores in global row
    order (R includes any shard padding; slice to the real row count).

    replicate_out=False keeps the outputs as row-SHARDED jax arrays
    instead (the layout='device' build path: nothing O(M) ever lands on
    host — sharded_balanced_layout consumes them in place)."""
    r, d = bank_sharded.shape
    p = mesh.shape[bank_axis]
    local = r // p
    a = min(n_choices, centroids.shape[0])
    chunk = min(chunk_rows, local)
    n_chunks = -(-local // chunk)
    pad_local = n_chunks * chunk

    ct_np = np.asarray(centroids, np.float32).T
    c_t = jax.make_array_from_callback(
        ct_np.shape, NamedSharding(mesh, P()), lambda idx: ct_np[idx]
    )

    def body(x_l, ct):
        x_p = _pad_rows_to(x_l, pad_local)
        blocks = x_p.reshape(n_chunks, chunk, d)

        def f(_, blk):
            s = blk.astype(jnp.float32) @ ct
            ids, tops = [], []
            for _i in range(a):
                top = jnp.argmax(s, axis=1)
                ids.append(top.astype(jnp.int32))
                tops.append(jnp.max(s, axis=1))
                s = jnp.where(
                    jax.nn.one_hot(top, s.shape[1], dtype=bool), -jnp.inf, s
                )
            return None, (jnp.stack(ids, 1), jnp.stack(tops, 1))

        _, (ids, sc) = jax.lax.scan(f, None, blocks)
        ids = ids.reshape(pad_local, a)[:local]
        sc = sc.reshape(pad_local, a)[:local]
        if not replicate_out:
            return ids, sc
        # Replicate the results so EVERY process can read them for the
        # host greedy layout — a bank-sharded output would not be
        # host-addressable on a multi-host mesh. NOT free: (R, A) int32 +
        # f32 is ~2*R*A*4 bytes per device (~246 MB at the 10.24M-row
        # north star) — transient; freed right after the host fetch below.
        return (
            jax.lax.all_gather(ids, bank_axis, tiled=True),
            jax.lax.all_gather(sc, bank_axis, tiled=True),
        )

    out_spec = P() if replicate_out else P(bank_axis)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(bank_axis), P()),
        out_specs=(out_spec, out_spec),
        check_vma=False,
    )
    ids, sc = fn(bank_sharded, c_t)
    if not replicate_out:
        return ids, sc
    ids_h, sc_h = np.asarray(ids), np.asarray(sc)
    ids.delete()
    sc.delete()
    return ids_h, sc_h


def _f32_sortkey(x: jax.Array) -> jax.Array:
    """Order-preserving uint32 key for f32 values (no NaNs expected):
    key(a) > key(b) iff a > b. The standard sign-flip trick — it turns
    per-leaf "top rows by score" selection into an integer threshold
    search that binary-converges in exactly 32 psum'd counting passes."""
    b = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    neg = b >= jnp.uint32(0x80000000)
    return jnp.where(neg, ~b, b | jnp.uint32(0x80000000))


def _occurrence_index(mask: jax.Array, leaf: jax.Array, n_leaves: int):
    """Rank of each masked row among masked rows with the SAME leaf id,
    in local-row order (int32; arbitrary values on unmasked rows).

    One stable int32 sort + a searchsorted over group starts — the
    device analogue of the host greedy's per-leaf rank bookkeeping."""
    n = leaf.shape[0]
    key = jnp.where(mask, leaf, n_leaves).astype(jnp.int32)
    order = jnp.argsort(key, stable=True)
    sk = key[order]
    starts = jnp.searchsorted(sk, jnp.arange(n_leaves + 1, dtype=jnp.int32))
    occ_sorted = jnp.arange(n, dtype=jnp.int32) - starts[sk]
    return jnp.zeros((n,), jnp.int32).at[order].set(occ_sorted)


def sharded_balanced_layout(
    choices_s: jax.Array,
    scores_s: jax.Array,
    n_leaves: int,
    cap: int,
    mesh: Mesh,
    *,
    bank_axis: str = "bank",
    valid_rows: int,
) -> Tuple[jax.Array, np.ndarray]:
    """Device-sharded twin of ops/ivf.balanced_layout: place every row
    into a capacity-bounded leaf slot with NOTHING O(M) on any host.

    The host greedy admits, per choice pass and per leaf, the strongest
    `cap - fill` candidates by (score desc, earlier-row-wins). Here the
    same selection is computed as a per-leaf THRESHOLD: a vectorized
    binary search over uint32 score sortkeys (32 iterations, each one
    shard-local mask + segment_sum + psum) finds the admission cutoff
    theta_l for every leaf at once; exact-tie rows are resolved by a
    second binary search over global row ids. Leaf MEMBERSHIP is
    identical to the host greedy whenever scores are tie-free (ties are
    still deterministic, but the host greedy breaks later-pass ties in
    its internal resort order rather than by row id); within-leaf slot
    ORDER is shard-major instead of score-sorted — the leaf scan kernels
    reduce over whole leaves, so slot order never affects search results.

    Rows that fit none of their choices spill to leaves with room, in
    global row order (the host greedy spills the same SET of rows).

    Args:
        choices_s / scores_s: (R, A) int32 / f32, row-sharded over
            `bank_axis` (sharded_assign_leaves(replicate_out=False));
            R includes shard padding.
        valid_rows: real row count M (padding rows get slot -1).

    Returns (slots (R,) int32 row-sharded, -1 on padding;
             leaf_fill (n_leaves,) np.int64 on host — L values only).
    """
    r, a = choices_s.shape
    p = mesh.shape[bank_axis]
    local = r // p
    m = int(valid_rows)
    ll = n_leaves
    assert n_leaves * cap >= m, (n_leaves, cap, m)

    def body(ch, sc):
        i = jax.lax.axis_index(bank_axis)
        grow = (i * local + jnp.arange(local)).astype(jnp.int32)
        valid = grow < m
        placed = ~valid  # padding rows are never candidates
        slot = jnp.full((local,), -1, jnp.int32)
        fill = jnp.zeros((ll,), jnp.int32)
        shard_pos = jnp.arange(p, dtype=jnp.int32)

        def count_per_leaf(mask, leaf):
            c = jax.ops.segment_sum(
                mask.astype(jnp.int32), leaf, num_segments=ll
            )
            return jax.lax.psum(c, bank_axis)

        for pass_a in range(a):
            leaf = ch[:, pass_a]
            key = _f32_sortkey(sc[:, pass_a])
            cand = ~placed
            room = jnp.maximum(cap - fill, 0)

            # Stage 1: per-leaf score threshold — smallest theta with
            # count(key > theta) <= room (count is non-increasing in
            # theta, so the invariant count(hi) <= room < count(lo-1)
            # binary-converges over the full uint32 range in 32 steps).
            def s1(_, lh):
                lo, hi = lh
                mid = lo + ((hi - lo) >> jnp.uint32(1))
                cnt = count_per_leaf(cand & (key > mid[leaf]), leaf)
                ok = cnt <= room
                return (
                    jnp.where(ok, lo, mid + jnp.uint32(1)),
                    jnp.where(ok, mid, hi),
                )

            theta, _ = jax.lax.fori_loop(
                0, 32, s1,
                (jnp.zeros((ll,), jnp.uint32),
                 jnp.full((ll,), 0xFFFFFFFF, jnp.uint32)),
            )
            above = cand & (key > theta[leaf])
            n_above = count_per_leaf(above, leaf)
            tie = cand & (key == theta[leaf])
            n_tie = count_per_leaf(tie, leaf)
            need = jnp.minimum(room - n_above, n_tie)

            # Stage 2: admit `need` exact-tie rows per leaf, smallest
            # global row ids first — smallest cutoff c with
            # count(tie & row < c) >= need; unique row ids make the
            # count step by 1, so exactly `need` rows land under c.
            def s2(_, lh):
                lo, hi = lh
                mid = lo + ((hi - lo) >> 1)
                g = count_per_leaf(tie & (grow < mid[leaf]), leaf)
                ok = g >= need
                return (
                    jnp.where(ok, lo, mid + 1),
                    jnp.where(ok, mid, hi),
                )

            cutoff, _ = jax.lax.fori_loop(
                0, 32, s2,
                (jnp.zeros((ll,), jnp.int32),
                 jnp.full((ll,), r, jnp.int32)),
            )
            acc = above | (tie & (grow < cutoff[leaf]))

            # Slot positions: fill + earlier shards' admissions + local
            # occurrence rank. Shard-major within-leaf order (see doc).
            occ = _occurrence_index(acc, leaf, ll)
            cnt_local = jax.ops.segment_sum(
                acc.astype(jnp.int32), leaf, num_segments=ll
            )
            cnt_all = jax.lax.all_gather(cnt_local, bank_axis)  # (p, L)
            earlier = jnp.where(
                shard_pos[:, None] < i, cnt_all, 0
            ).sum(axis=0)
            base = fill + earlier
            slot = jnp.where(
                acc, leaf * cap + base[leaf] + occ, slot
            )
            placed = placed | acc
            fill = fill + n_above + need

        # Spill pass: remaining rows go to leaves with room, in global
        # row order (deterministic; same spilled SET as the host greedy).
        un = ~placed
        occ_un = jnp.cumsum(un.astype(jnp.int32)) - un.astype(jnp.int32)
        u_all = jax.lax.all_gather(un.sum().astype(jnp.int32), bank_axis)
        base_u = jnp.where(shard_pos < i, u_all, 0).sum()
        gpos = base_u + occ_un
        room = jnp.maximum(cap - fill, 0)
        rc = jnp.cumsum(room)
        leaf_sp = jnp.clip(
            jnp.searchsorted(rc, gpos, side="right").astype(jnp.int32),
            0, ll - 1,
        )
        offset = gpos - (rc[leaf_sp] - room[leaf_sp])
        slot = jnp.where(un, leaf_sp * cap + fill[leaf_sp] + offset, slot)
        fill = fill + count_per_leaf(un, leaf_sp)
        return slot, fill

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(bank_axis), P(bank_axis)),
        out_specs=(P(bank_axis), P()),
        check_vma=False,
    )
    slots, fill = fn(choices_s, scores_s)
    return slots, np.asarray(fill).astype(np.int64)


def ring_scatter_build(
    bank_sharded: jax.Array,
    labels_sharded: jax.Array,
    slots,
    n_slots: int,
    mesh: Mesh,
    *,
    bank_axis: str = "bank",
    with_perm: bool = False,
):
    """Scatter row-sharded (rows, labels) into the leaf-slab layout,
    slab-sharded over the same axis, WITHOUT gathering the bank anywhere.

    A p-step ring: each shard's (rows, labels, slots) buffer ppermutes
    around the bank axis; at every step each shard scatters the rows
    whose global slot falls inside its slab (out-of-slab rows land on a
    throwaway pad row). slots entries of -1 (padding) never place.

    `slots` is either a host (M,) array (replicated layout) or an
    already row-sharded (R,) jax.Array (sharded_balanced_layout output).

    Returns (ivf_bank (n_slots, D), ivf_labels (n_slots, C)), sharded —
    plus, when `with_perm`, a slab-sharded (n_slots,) int32 perm mapping
    slot -> original global row id (-1 padding), built by riding the
    global row ids around the same ring (no host-side O(n_slots) perm).
    """
    p = mesh.shape[bank_axis]
    assert n_slots % p == 0, (n_slots, p)
    local_slots = n_slots // p
    r = bank_sharded.shape[0]
    if isinstance(slots, jax.Array):
        assert slots.shape[0] == r, (slots.shape, r)
        slots_j = slots
    else:
        slots_np = np.asarray(slots, np.int32)
        if slots_np.shape[0] < r:
            # Shard-padding rows must carry slot -1 (never placed) — a
            # zero pad would overwrite real slot 0 with a zero row.
            slots_np = np.concatenate(
                [slots_np, np.full(r - slots_np.shape[0], -1, np.int32)]
            )
        # make_array_from_callback: multi-process safe (same global slots
        # on every process; each materializes its addressable shards).
        slots_j = jax.make_array_from_callback(
            slots_np.shape,
            NamedSharding(mesh, P(bank_axis)),
            lambda idx: slots_np[idx],
        )

    def body(rows, labs, sl):
        i = jax.lax.axis_index(bank_axis)
        start = i * local_slots
        local_r = rows.shape[0]
        gids = (i * local_r + jnp.arange(local_r)).astype(jnp.int32)

        def scat(state, payload):
            slab, lslab, pslab = state
            rr, ll, ss, gg = payload
            loc = ss - start
            ok = (loc >= 0) & (loc < local_slots)
            loc = jnp.where(ok, loc, local_slots)  # dump row
            return (
                slab.at[loc].set(rr),
                lslab.at[loc].set(ll),
                pslab.at[loc].set(gg),
            )

        slab = jnp.zeros((local_slots + 1, rows.shape[1]), rows.dtype)
        lslab = jnp.zeros((local_slots + 1, labs.shape[1]), jnp.float32)
        pslab = jnp.full((local_slots + 1,), -1, jnp.int32)
        state = scat(
            (slab, lslab, pslab),
            (rows, labs.astype(jnp.float32), sl, gids),
        )

        perm = [(j, (j + 1) % p) for j in range(p)]

        def ring_step(carry, _):
            state, rr, ll, ss, gg = carry
            rr = jax.lax.ppermute(rr, bank_axis, perm)
            ll = jax.lax.ppermute(ll, bank_axis, perm)
            ss = jax.lax.ppermute(ss, bank_axis, perm)
            gg = jax.lax.ppermute(gg, bank_axis, perm)
            state = scat(state, (rr, ll, ss, gg))
            return (state, rr, ll, ss, gg), None

        (state, *_), _ = jax.lax.scan(
            ring_step,
            (state, rows, labs.astype(jnp.float32), sl, gids),
            None,
            length=p - 1,
        )
        slab, lslab, pslab = state
        return slab[:local_slots], lslab[:local_slots], pslab[:local_slots]

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(bank_axis), P(bank_axis), P(bank_axis)),
        out_specs=(P(bank_axis), P(bank_axis), P(bank_axis)),
        check_vma=False,
    )
    slab, lslab, pslab = fn(bank_sharded, labels_sharded, slots_j)
    if with_perm:
        return slab, lslab, pslab
    return slab, lslab


def build_ivf_sharded(
    bank,
    labels,
    centroids: jax.Array,
    n_leaves: int,
    cap: int,
    mesh: Mesh,
    *,
    bank_axis: str = "bank",
    n_choices: int = 3,
    valid_rows: Optional[int] = None,
    layout: str = "host",
):
    """Distributed tree build: row-sharded bank -> leaf-slab-sharded IVF
    arrays.

    layout='host' (default): the (M, A) choices/scores replicate to every
        process and the SAME host greedy as the single-device build
        (ops/ivf.balanced_layout) places them — slot assignment is
        bit-identical to an unsharded build. O(M) host memory per
        process (~2.4 GB at 100M rows).
    layout='device': nothing O(M) ever lands on any host — leaf
        admission runs as a sharded binary threshold search
        (sharded_balanced_layout) and the slot->row perm rides the
        scatter ring. Leaf MEMBERSHIP matches the host greedy on
        tie-free scores; within-leaf slot ORDER is shard-major instead
        of score-sorted (leaf scans reduce over whole leaves, so search
        results are unaffected). The >100M-row path.

    (Full-bank Lloyd refinement is NOT folded in here: plain Lloyd after
    a capacity refinement undoes it — run sharded_kmeans yourself before
    refining, as search_approx._build_tree_sharded does.)

    Args:
        bank: (M, D) host array or (already) row-sharded jax.Array.
        labels: (M, C) or None.
        centroids: (n_leaves, D) trained centroids (replicated; e.g. from
            a sample via ops/ivf.train_centroids).
        valid_rows: real row count when `bank` is pre-sharded WITH
            padding (shard_rows pads to a multiple of the axis size) —
            without it the zero pad rows would be placed in leaves as
            searchable ghost candidates.

    Returns dict(ivf_bank, ivf_labels (sharded), centroids, perm,
        slots, leaf_fill (np), valid_rows). With layout='host' perm/slots
        are host numpy ((n_slots,) / (M,)); with layout='device' they are
        mesh-sharded jax int32 arrays ((n_slots,) slab-sharded / (R,)
        row-sharded incl. padding rows at -1).
    """
    if isinstance(bank, jax.Array) and bank.sharding.is_equivalent_to(
        NamedSharding(mesh, P(bank_axis)), bank.ndim
    ):
        bank_s = bank  # already row-sharded (e.g. a .bankdir mesh load)
        m = valid_rows if valid_rows is not None else bank.shape[0]
    else:
        bank_s, m = shard_rows(bank, mesh, bank_axis)
        assert valid_rows is None or valid_rows == m, (valid_rows, m)
    if labels is None:
        labels = np.zeros((m, 1), np.float32)
    # Labels either carry the true row count (shard_rows pads them here)
    # or arrive PRE-PADDED alongside a pre-sharded bank (the engine's
    # meshed accumulation pads both to even shards).
    assert labels.shape[0] in (m, bank_s.shape[0]), (labels.shape, m)
    labels_s, _ = shard_rows(labels, mesh, bank_axis)
    if layout not in ("host", "device"):
        raise ValueError(f"layout must be 'host' or 'device': {layout}")
    n_slots = n_leaves * cap

    if layout == "device":
        choices_s, scores_s = sharded_assign_leaves(
            bank_s, centroids, mesh, n_choices=n_choices,
            bank_axis=bank_axis, replicate_out=False,
        )
        slots_s, fill = sharded_balanced_layout(
            choices_s, scores_s, n_leaves, cap, mesh,
            bank_axis=bank_axis, valid_rows=m,
        )
        ivf_bank, ivf_labels, perm_s = ring_scatter_build(
            bank_s, labels_s, slots_s, n_slots, mesh,
            bank_axis=bank_axis, with_perm=True,
        )
        return dict(
            ivf_bank=ivf_bank,
            ivf_labels=ivf_labels,
            centroids=centroids,
            perm=perm_s,
            slots=slots_s,
            leaf_fill=fill,
            valid_rows=m,
        )

    choices, scores = sharded_assign_leaves(
        bank_s, centroids, mesh, n_choices=n_choices, bank_axis=bank_axis
    )
    choices, scores = choices[:m], scores[:m]

    from hbird_tpu.ops.ivf import balanced_layout

    slots, fill = balanced_layout(choices, n_leaves, cap, scores=scores)
    ivf_bank, ivf_labels = ring_scatter_build(
        bank_s, labels_s, slots, n_slots, mesh, bank_axis=bank_axis
    )
    perm = np.full((n_slots,), -1, np.int32)
    perm[slots] = np.arange(m, dtype=np.int32)
    return dict(
        ivf_bank=ivf_bank,
        ivf_labels=ivf_labels,
        centroids=centroids,
        perm=perm,
        slots=slots,
        leaf_fill=fill,
        valid_rows=m,
    )
