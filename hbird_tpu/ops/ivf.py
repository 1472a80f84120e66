"""IVF (leaf-partitioned) approximate kNN — ScaNN's tree() on TPU.

The reference's ScaNN backend prunes the scan with a k-means tree:
`tree(num_leaves=512, num_leaves_to_search=32)` partitions the bank and
scores only the probed leaves (reference hbird/nn/search_scann.py:26-27).
The TPU translation here keeps everything static-shaped and MXU-friendly:

- **Spherical k-means** on a row sample trains `num_leaves` centroids
  (bank rows are unit-norm, so dot == cosine).
- **Capacity-balanced layout**: every leaf owns EXACTLY `cap` bank slots
  (one kernel tile). Rows go to their best leaf with free space, else
  their next choices, else any leaf with room — so the bank reorders into
  a dense (n_leaves * cap, D) array where leaf i is rows [i*cap, (i+1)*cap)
  and the first `leaf_valid[i]` of them are real. Fixed capacity is what
  makes the probed-leaf scan a static-shape Pallas kernel instead of a
  ragged gather.
- **Block-level probing**: queries are processed in tiles of `block_q`
  (patches from the same images are semantically clustered, so a tile
  shares leaf affinity); each tile scans the union top-`n_probe` leaves
  by per-tile max centroid score.
- **Search kernel**: the exact kernel's fused matmul + carry-merge
  (ops/knn_pallas.py), with the bank tile chosen DYNAMICALLY per grid
  step via scalar-prefetched leaf ids (PrefetchScalarGridSpec index_map)
  — the retrieval analogue of block-sparse attention.

Scanned rows per query: n_probe * cap instead of the full bank — a
(n_leaves / n_probe)x FLOP/HBM reduction at recall governed by n_probe.
An XLA reference path (gather + einsum + top_k) provides the same math
for CPU tests and non-TPU backends.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hbird_tpu.ops.knn_pallas import NEG_INF, _carry_merge, _round_up


# ----------------------------------------------------------------------
# Build: centroids, balanced assignment, layout
# ----------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("n_leaves", "iters", "spherical"))
def train_centroids(
    sample: jax.Array,
    n_leaves: int,
    *,
    iters: int = 12,
    key: Optional[jax.Array] = None,
    spherical: bool = True,
) -> jax.Array:
    """Lloyd's k-means on a row sample (MXU assign + segment-sum update).

    spherical=True re-normalizes centroids each iteration (cosine
    clustering — the right geometry for unit-norm MIPS banks).
    Empty leaves keep their previous centroid.
    """
    sample = sample.astype(jnp.float32)
    if key is None:
        key = jax.random.PRNGKey(0)
    s_n = sample.shape[0]
    init = jax.random.choice(key, s_n, (n_leaves,), replace=s_n < n_leaves)
    c0 = sample[init]

    def step(c, _):
        scores = sample @ c.T  # (S, K)
        a = jnp.argmax(scores, axis=1)
        sums = jax.ops.segment_sum(sample, a, num_segments=n_leaves)
        cnt = jax.ops.segment_sum(
            jnp.ones((s_n,), jnp.float32), a, num_segments=n_leaves
        )[:, None]
        newc = jnp.where(cnt > 0, sums / jnp.maximum(cnt, 1.0), c)
        if spherical:
            newc = newc / jnp.maximum(
                jnp.linalg.norm(newc, axis=1, keepdims=True), 1e-12
            )
        return newc, None

    c, _ = jax.lax.scan(step, c0, None, length=iters)
    return c


def refine_centroids_balanced(
    sample: jax.Array,
    centroids: jax.Array,
    *,
    slack: float,
    rounds: int = 2,
    spherical: bool = True,
) -> jax.Array:
    """Capacity-aware k-means refinement.

    Plain Lloyd's produces leaves whose natural sizes exceed the fixed
    per-leaf capacity (21.8% of rows measured off their best leaf at
    slack 1.3 on hard mixtures). Each round re-fits every centroid to the
    members its leaf would actually hold under the capacity constraint
    (score-priority balanced placement on the sample), pulling centroids
    toward capacity-respecting partitions.
    """
    n_leaves, d = centroids.shape
    s_n = sample.shape[0]
    cap_s = max(1, int(np.ceil(s_n * slack / n_leaves)))
    c = centroids
    for _ in range(rounds):
        choices, scores = assign_leaves(
            sample, c, n_choices=3, return_scores=True
        )
        slots, _fill = balanced_layout(choices, n_leaves, cap_s,
                                       scores=scores)
        leaf = jnp.asarray(slots // cap_s, jnp.int32)
        sums = jax.ops.segment_sum(
            sample.astype(jnp.float32), leaf, num_segments=n_leaves
        )
        cnt = jax.ops.segment_sum(
            jnp.ones((s_n,), jnp.float32), leaf, num_segments=n_leaves
        )[:, None]
        newc = jnp.where(cnt > 0, sums / jnp.maximum(cnt, 1.0), c)
        if spherical:
            newc = newc / jnp.maximum(
                jnp.linalg.norm(newc, axis=1, keepdims=True), 1e-12
            )
        c = newc
    return c


@functools.partial(jax.jit, static_argnames=("a",))
def _assign_block(rows, c_t, a: int):
    """Top-`a` leaf ids + scores for one row block.

    Module-level jit (centroids as an ARGUMENT): a per-call closure would
    retrace and recompile on every assign_leaves invocation — painful
    through a remote compiler. Iterated argmax + knockout instead of
    lax.top_k: top_k over the leaf axis measured ~150s for 1M rows x 512
    leaves on v5e (the same sort bottleneck as the XLA kNN path); `a`
    argmax passes are pure VPU reductions.
    """
    s = rows.astype(jnp.float32) @ c_t
    ids = []
    tops = []
    for _ in range(a):
        top = jnp.argmax(s, axis=1)
        ids.append(top.astype(jnp.int32))
        tops.append(jnp.max(s, axis=1))
        s = jnp.where(jax.nn.one_hot(top, s.shape[1], dtype=bool), NEG_INF, s)
    return jnp.stack(ids, axis=1), jnp.stack(tops, axis=1)


def assign_leaves(
    bank,
    centroids: jax.Array,
    n_choices: int = 3,
    block_rows: int = 1 << 18,
    return_scores: bool = False,
):
    """Top-`n_choices` leaf preferences per bank row — (M, A) int32 numpy
    (+ the matching (M, A) f32 centroid scores when `return_scores`).

    Blockwise on device (one compiled shape; the tail block is padded).
    """
    c_t = centroids.T  # (D, K)
    a = min(n_choices, centroids.shape[0])

    def block_fn(rows):
        return _assign_block(rows, c_t, a)

    m = bank.shape[0]
    # Don't pad a small input (e.g. the k-means refinement sample) all the
    # way up to the default block.
    block_rows = min(block_rows, _round_up(m, 256))
    out = np.empty((m, a), np.int32)
    sc = np.empty((m, a), np.float32)
    for i in range(0, m, block_rows):
        blk = bank[i : i + block_rows]
        n = blk.shape[0]
        if n < block_rows:
            blk = (
                jnp.pad(blk, ((0, block_rows - n), (0, 0)))
                if isinstance(blk, jax.Array)
                else np.pad(np.asarray(blk), ((0, block_rows - n), (0, 0)))
            )
        ids_b, sc_b = block_fn(jnp.asarray(blk))
        out[i : i + n] = np.asarray(ids_b)[:n]
        sc[i : i + n] = np.asarray(sc_b)[:n]
    return (out, sc) if return_scores else out


def balanced_layout(
    choices: np.ndarray,
    n_leaves: int,
    cap: int,
    scores: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Place every row into a leaf slot honoring per-leaf capacity.

    choices: (M, A) per-row leaf preferences (best first).
    scores: optional (M, A) centroid scores. When given, an overfull leaf
        keeps its HIGHEST-scoring members and spills its weakest — the
        spilled rows are exactly those whose next choice is nearly as
        good, so the recall cost of capacity pressure is minimized.
    Returns (slots (M,) int64 in [0, n_leaves*cap), leaf_fill (n_leaves,)).
    Requires n_leaves * cap >= M. Rows that fit none of their choices go
    to arbitrary leaves with room (they are still found whenever that
    leaf is probed; the recall effect is measured, not assumed).
    """
    m, n_choice = choices.shape
    assert n_leaves * cap >= m, (n_leaves, cap, m)
    slot = np.full(m, -1, np.int64)
    fill = np.zeros(n_leaves, np.int64)
    unplaced = np.arange(m)

    def place(rows: np.ndarray, leaf: np.ndarray, respect_room: bool,
              prio: Optional[np.ndarray] = None):
        nonlocal unplaced
        if prio is not None:
            order = np.lexsort((-prio, leaf))  # by leaf, strongest first
        else:
            order = np.argsort(leaf, kind="stable")
        ls = leaf[order]
        starts = np.searchsorted(ls, np.arange(n_leaves))
        rank = np.arange(ls.size) - starts[ls]
        ok = rank < (cap - fill)[ls] if respect_room else np.ones(ls.size, bool)
        rows_ok = rows[order[ok]]
        lf = ls[ok]
        slot[rows_ok] = lf * cap + fill[lf] + rank[ok]
        fill[:] += np.bincount(lf, minlength=n_leaves)
        return rows[order[~ok]]

    for a in range(n_choice):
        if unplaced.size == 0:
            break
        unplaced = place(
            unplaced,
            choices[unplaced, a],
            respect_room=True,
            prio=scores[unplaced, a] if scores is not None else None,
        )
    if unplaced.size:
        room = (cap - fill).clip(min=0)
        spill_leaf = np.repeat(np.arange(n_leaves), room)[: unplaced.size]
        leftover = place(unplaced, spill_leaf, respect_room=False)
        assert leftover.size == 0
    return slot, fill


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_rows(dst, src, slots):
    # Donated destination: the scatter runs in place, so building the
    # leaf layout peaks at src + dst instead of src + 2x dst (the eager
    # .at[].set kept zeros and result as separate buffers and OOMed a
    # 16 GB chip at 5M rows).
    return dst.at[slots].set(src)


def build_ivf_arrays(bank, labels, slots: np.ndarray, n_leaves: int, cap: int):
    """Scatter rows into the dense leaf layout.

    Returns (ivf_bank (n_leaves*cap, D), ivf_labels or None, perm
    (n_leaves*cap,) int32 original row id (-1 padding)). Runs on device —
    padding slots stay zero (never selected: leaf_valid masks them).
    """
    m, d = bank.shape
    n_slots = n_leaves * cap
    slots_j = jnp.asarray(slots, jnp.int32)
    bank_j = bank if isinstance(bank, jax.Array) else jnp.asarray(np.asarray(bank))
    ivf_bank = _scatter_rows(
        jnp.zeros((n_slots, d), bank_j.dtype), bank_j, slots_j
    )
    ivf_labels = None
    if labels is not None:
        lab_j = (
            labels
            if isinstance(labels, jax.Array)
            else jnp.asarray(np.asarray(labels, np.float32))
        )
        ivf_labels = _scatter_rows(
            jnp.zeros((n_slots, lab_j.shape[1]), jnp.float32),
            lab_j.astype(jnp.float32),
            slots_j,
        )
    perm = _scatter_rows(
        jnp.full((n_slots,), -1, jnp.int32),
        jnp.arange(m, dtype=jnp.int32),
        slots_j,
    )
    return ivf_bank, ivf_labels, perm


def tree_layout(n_rows: int, num_leaves: int, slack: float = 1.3) -> Tuple[int, int]:
    """(n_leaves, cap) for a bank of n_rows: per-leaf capacity sized with
    `slack` headroom (capacity/mean-leaf-size; higher = fewer rows pushed
    off their best leaf, more padded scan), rounded up to 256 rows (int8
    sublane tiling x8 safety)."""
    num_leaves = max(1, min(num_leaves, n_rows))
    cap = _round_up(max(1, int(np.ceil(n_rows * slack / num_leaves))), 256)
    return num_leaves, cap


# ----------------------------------------------------------------------
# Search: block-level leaf selection + probed-leaf scan
# ----------------------------------------------------------------------
def select_block_leaves(
    q_pad: jax.Array, centroids: jax.Array, n_probe: int, block_q: int
) -> jax.Array:
    """Top-`n_probe` leaves per query TILE by the tile's max centroid
    score — (n_tiles, n_probe) int32. q_pad rows must be a multiple of
    block_q."""
    n_leaves = centroids.shape[0]
    n_probe = min(n_probe, n_leaves)
    qc = q_pad.astype(jnp.float32) @ centroids.T  # (Q, K)
    qb = qc.reshape(-1, block_q, n_leaves).max(axis=1)  # (tiles, K)
    _, ids = jax.lax.top_k(qb, n_probe)
    return ids.astype(jnp.int32)


def coherent_query_order(q: jax.Array, centroids: jax.Array) -> jax.Array:
    """Stable order grouping queries by their top-1 leaf.

    Block-level probing needs leaf-coherent query tiles. Engine tiles
    (patches of consecutive images) are naturally coherent; arbitrary
    query sets are not — sorting by primary leaf restores coherence for
    one O(Q log Q) argsort. This is the reference analysis' "host-side
    query grouping" (TODO.md IVF note) done on-device with static shapes.
    """
    top1 = jnp.argmax(q.astype(jnp.float32) @ centroids.T, axis=1)
    return jnp.argsort(top1)


def tile_coherence(queries, centroids, block_q: int) -> float:
    """Mean distinct primary leaves per (sorted) query tile — the quantity
    that governs block-probing recall: a tile whose queries span more
    primary leaves than `n_probe` CANNOT cover every query's best leaf.

    Host-side diagnostic (concrete arrays only). Engine-density tiles
    measure ~1-4; iid/sparse query sets measure ~n_leaves * block_q / Q.
    """
    q = jnp.asarray(queries).astype(jnp.float32)
    top1 = np.sort(
        np.asarray(jnp.argmax(q @ centroids.T.astype(jnp.float32), axis=1))
    )
    pad = (-top1.size) % block_q
    if pad:
        top1 = np.concatenate([top1, np.full(pad, top1[-1])])
    tiles = top1.reshape(-1, block_q)
    distinct = (np.diff(tiles, axis=1) != 0).sum(axis=1) + 1
    return float(distinct.mean())


def ivf_search(
    queries: jax.Array,
    ivf_bank: jax.Array,
    centroids: jax.Array,
    leaf_valid: jax.Array,
    k: int,
    *,
    cap: int,
    n_probe: int,
    block_q: int = 256,
    sort_queries: bool = True,
    kernel: str = "auto",
    interpret: Optional[bool] = None,
    probe_mode: str = "tile",
    row_scale: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Full IVF search: (group) -> probe -> scan -> (ungroup).

    probe_mode:
    - 'tile' (default): the union-shortlist block probing above — fastest,
      correct recall at engine query density (leaf-coherent tiles).
    - 'query': true per-query probing (ScaNN's leaves_to_search semantics,
      reference search_scann.py:26-27) — every query scans ITS top
      `n_probe` leaves. Host-orchestrated grouping; requires concrete
      (non-traced) queries. Matched scan budget up to tile padding.
    - 'auto': measure tile coherence and pick; traced queries fall back
      to 'tile' (the engine's tiles are leaf-coherent by construction).

    Returns (values (Q, k) f32, indices (Q, k) int32 in IVF layout).
    """
    traced = isinstance(queries, jax.core.Tracer)
    if probe_mode == "auto":
        if traced:
            probe_mode = "tile"
        else:
            coh = tile_coherence(queries, centroids, block_q)
            # A tile's shortlist has n_probe slots; leave headroom for
            # secondary leaves (a query's neighbours are rarely all in
            # its primary leaf).
            probe_mode = "query" if coh > max(2.0, n_probe / 2) else "tile"
            if probe_mode == "query":
                from hbird_tpu.utils.logging import get_logger

                # Per-query probing materializes each query once per
                # probed leaf (Q * n_probe rows) PLUS per-leaf tile
                # padding (ceil(count/block_q)*block_q per probed leaf,
                # worst-case block_q-1 extra rows per leaf) and up to 15
                # bucketing tiles. Cap the duplicated buffer at 1 GB —
                # above that a low-coherence query set stays on the tile
                # path with a diluted-recall warning rather than risking
                # device OOM next to a large bank.
                dup_rows = (
                    queries.shape[0] * min(n_probe, centroids.shape[0])
                    + (centroids.shape[0] + 15) * block_q
                )
                dup_bytes = (
                    dup_rows * queries.shape[1]
                    * jnp.dtype(jnp.float32).itemsize
                )
                if dup_bytes > 1 << 30:
                    probe_mode = "tile"
                    get_logger(__name__).warning(
                        "ivf_search: low tile coherence (%.1f distinct "
                        "primary leaves/tile vs n_probe=%d) but the query "
                        "set is too large for per-query probing "
                        "(%.1f GB duplicated); staying on tile probing — "
                        "recall may be diluted. Split the query set or "
                        "pass probe_mode='query' explicitly.",
                        coh, n_probe, dup_bytes / 2**30,
                    )
                else:
                    get_logger(__name__).info(
                        "ivf_search: low tile coherence (%.1f distinct "
                        "primary leaves/tile vs n_probe=%d) — switching "
                        "to per-query probing.", coh, n_probe,
                    )
    if probe_mode == "query":
        if traced:
            raise ValueError(
                "probe_mode='query' needs concrete queries (host-side "
                "grouping); use 'tile' inside jit"
            )
        return ivf_search_per_query(
            queries, ivf_bank, centroids, leaf_valid, k,
            cap=cap, n_probe=n_probe, block_q=block_q, kernel=kernel,
            interpret=interpret, row_scale=row_scale,
        )
    assert probe_mode == "tile", probe_mode
    q_n = queries.shape[0]
    order = inv = None
    if sort_queries:
        order = coherent_query_order(queries, centroids)
        inv = jnp.argsort(order)
        queries = queries[order]
    q_pad = _round_up(q_n, block_q)
    if q_pad != q_n:
        # Edge padding (replicate the last query): zero rows would vote
        # score 0 for every leaf in the last tile's shortlist and distort
        # it whenever real queries score negatively against all centroids.
        queries = jnp.pad(queries, ((0, q_pad - q_n), (0, 0)), mode="edge")
    lids = select_block_leaves(queries, centroids, n_probe, block_q)
    if kernel == "auto":
        # Mosaic only compiles on TPU; elsewhere the XLA gather path is
        # the real implementation (interpreted Pallas is orders of
        # magnitude slower).
        kernel = "pallas" if jax.default_backend() == "tpu" else "xla"
    if kernel == "pallas":
        vals, idx = pallas_ivf_knn(
            queries, ivf_bank, lids, leaf_valid, k,
            cap=cap, block_q=block_q, interpret=interpret,
            row_scale=row_scale,
        )
    else:
        vals, idx = ivf_search_xla(
            queries, ivf_bank, lids, leaf_valid, k, cap=cap,
            row_scale=row_scale,
        )
    vals, idx = vals[:q_n], idx[:q_n]
    if inv is not None:
        vals, idx = vals[inv], idx[inv]
    return vals, idx


def ivf_search_per_query(
    queries: jax.Array,
    ivf_bank: jax.Array,
    centroids: jax.Array,
    leaf_valid: jax.Array,
    k: int,
    *,
    cap: int,
    n_probe: int,
    block_q: int = 128,
    kernel: str = "auto",
    interpret: Optional[bool] = None,
    row_scale: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Per-query probing: every query scans exactly ITS top-`n_probe`
    leaves (ScaNN leaves_to_search semantics, reference
    search_scann.py:26-27).

    Block probing dilutes sparse query sets: a 256-query tile spanning 60
    primary leaves shares one n_probe-leaf shortlist (measured recall
    0.538 at 2048 iid queries vs 0.982 at engine density). Here the
    (query, leaf) probe pairs are grouped BY LEAF on the host, each leaf's
    queries padded to `block_q` tiles, and the existing fused kernel runs
    with one slab per tile — so the scan budget is exactly
    Q * n_probe * cap rows (plus tile padding), independent of coherence.
    Per-query results are regathered, deduplicated (a bank row found via
    two probed leaves must not occupy two of the k slots), and top-k'd.

    Requires concrete (non-traced) queries; for small/interactive query
    sets this path's host orchestration is negligible.
    """
    q_n, d = queries.shape
    if q_n == 0:
        # Empty query set: bucketing below would pad 16 dummy tiles whose
        # q_sel rows index query 0 of a zero-row array — return clean
        # empty shapes instead.
        return (
            jnp.zeros((0, k), jnp.float32),
            jnp.zeros((0, k), jnp.int32),
        )
    n_leaves = centroids.shape[0]
    t = min(n_probe, n_leaves)
    kk = min(k, 128)

    # Per-query top-t leaves (iterated argmax — lax.top_k over the leaf
    # axis is pathologically slow on TPU, see _assign_block).
    q_leaves, _ = _assign_block(
        jnp.asarray(queries), centroids.T.astype(jnp.float32), t
    )
    q_leaves = np.asarray(q_leaves)

    # ---- host grouping: (query, leaf) pairs -> leaf-major padded tiles.
    pair_q = np.repeat(np.arange(q_n, dtype=np.int32), t)
    pair_l = q_leaves.reshape(-1)
    order = np.argsort(pair_l, kind="stable")
    sorted_l = pair_l[order]
    uniq, counts = np.unique(sorted_l, return_counts=True)
    tiles_per_leaf = -(-counts // block_q)  # ceil
    tile_leaf = np.repeat(uniq, tiles_per_leaf).astype(np.int32)
    group_sizes = tiles_per_leaf * block_q
    group_starts = np.concatenate(([0], np.cumsum(group_sizes)))[:-1]
    count_starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
    leaf_of_sorted = np.searchsorted(uniq, sorted_l)
    rank = np.arange(sorted_l.size) - count_starts[leaf_of_sorted]
    pos_sorted = group_starts[leaf_of_sorted] + rank
    total = int(group_sizes.sum())
    q_sel = np.zeros(total, np.int32)  # padding rows re-scan query 0
    q_sel[pos_sorted] = pair_q[order]
    pair_pos = np.empty(pair_q.size, np.int64)
    pair_pos[order] = pos_sorted

    # Bucket the tile count to a multiple of 16: the kernel's grid/shapes
    # (and thus its jit-cache key) depend on the tile count, which varies
    # with each query set's leaf histogram — without bucketing nearly
    # every new batch pays a fresh Pallas compile (minutes each through
    # the remote Mosaic compiler). A dummy tile re-scans one leaf slab
    # for block_q copies of query 0 and its results are never regathered;
    # at most 15 extra tiles ≈ 15*cap*block_q MACs — noise next to the
    # real Q*n_probe*cap scan.
    t_pad = (-tile_leaf.size) % 16
    if t_pad:
        fill_leaf = tile_leaf[0] if tile_leaf.size else np.int32(0)
        tile_leaf = np.concatenate(
            [tile_leaf, np.full(t_pad, fill_leaf, np.int32)]
        )
        q_sel = np.concatenate([q_sel, np.zeros(t_pad * block_q, np.int32)])

    q_grouped = jnp.asarray(queries)[jnp.asarray(q_sel)]
    lids = jnp.asarray(tile_leaf[:, None])  # (T, 1): one slab per tile
    if kernel == "auto":
        kernel = "pallas" if jax.default_backend() == "tpu" else "xla"
    if kernel == "pallas":
        vals, idx = pallas_ivf_knn(
            q_grouped, ivf_bank, lids, leaf_valid, kk,
            cap=cap, block_q=block_q, interpret=interpret,
            row_scale=row_scale,
        )
    else:
        vals, idx = ivf_search_xla(
            q_grouped, ivf_bank, lids, leaf_valid, kk, cap=cap,
            row_scale=row_scale,
        )

    # ---- regather per query, dedup, final top-k (device, static shapes).
    pp = jnp.asarray(pair_pos)
    cand_vals = vals[pp].reshape(q_n, t * kk)
    cand_idx = idx[pp].reshape(q_n, t * kk)
    return _dedup_topk(cand_vals, cand_idx, k)


@functools.partial(jax.jit, static_argnames=("k",))
def _dedup_topk(cand_vals, cand_idx, k: int):
    """Top-k over candidate sets that may repeat bank rows (equal scores):
    keep the first occurrence of each idx, mask the rest to -inf."""
    # Invalid fillers (underfilled leaves emit -inf with idx 0) must not
    # collide with a REAL row-0 candidate in the dedup grouping — give
    # them a sentinel id no real row reaches.
    cand_idx = jnp.where(
        jnp.isfinite(cand_vals), cand_idx, jnp.int32(2**30)
    )
    order = jnp.argsort(cand_idx, axis=1)
    si = jnp.take_along_axis(cand_idx, order, axis=1)
    sv = jnp.take_along_axis(cand_vals, order, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros_like(si[:, :1], jnp.bool_), si[:, 1:] == si[:, :-1]],
        axis=1,
    )
    sv = jnp.where(dup, NEG_INF, sv)
    vals, sel = jax.lax.top_k(sv, k)
    idx = jnp.take_along_axis(si, sel, axis=1)
    # A query whose probed leaves hold fewer than k distinct valid rows
    # gets trailing -inf slots — clamp their sentinel id back to 0 so
    # every returned index is a valid IVF-layout position (consumers map
    # indices through the layout perm; 2**30 would be out of range).
    idx = jnp.where(idx >= jnp.int32(2**30), 0, idx)
    return vals, idx


def ivf_search_xla(
    queries: jax.Array,
    ivf_bank: jax.Array,
    leaf_ids: jax.Array,
    leaf_valid: jax.Array,
    k: int,
    *,
    cap: int,
    row_scale: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Reference XLA path: gather the probed leaf slabs, one fused
    score+top_k per query tile. Same math as the Pallas kernel (f32
    accumulation, int8 -> int32 -> f32), used on CPU and for parity
    tests. queries rows must be a multiple of the leaf_ids tile count.
    """
    q_n, d = queries.shape
    tiles, n_probe = leaf_ids.shape
    block_q = q_n // tiles
    n_slabs = ivf_bank.shape[0] // cap
    bank3 = ivf_bank.reshape(n_slabs, cap, d)
    scale3 = (
        row_scale.reshape(n_slabs, cap) if row_scale is not None else None
    )
    int8_in = queries.dtype == jnp.int8
    col_local = jax.lax.broadcasted_iota(jnp.int32, (n_probe, cap), 1)

    def tile_fn(q_t, lids):
        slabs = bank3[lids].reshape(n_probe * cap, d)  # (L*cap, D)
        if slabs.dtype == jnp.int8 and not int8_in:
            # Asymmetric scoring: float queries against int8 slabs (same
            # cast the Pallas kernel does per tile).
            slabs = slabs.astype(q_t.dtype)
        s = jax.lax.dot_general(
            q_t,
            slabs,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32 if int8_in else jnp.float32,
        ).astype(jnp.float32)
        if scale3 is not None:
            s = s * scale3[lids].reshape(-1)[None, :]
        valid = leaf_valid[lids]  # (L,)
        mask = (col_local < valid[:, None]).reshape(-1)
        s = jnp.where(mask[None, :], s, NEG_INF)
        vals, pos = jax.lax.top_k(s, k)
        gcols = (lids[:, None] * cap + col_local).reshape(-1)
        return vals, gcols[pos]

    vals, idx = jax.vmap(tile_fn)(
        queries.reshape(tiles, block_q, d), leaf_ids
    )
    return vals.reshape(q_n, k), idx.reshape(q_n, k)


def _ivf_kernel(
    leaf_ids_ref,  # SMEM (n_tiles, n_probe) int32 — slabs per query tile
    leaf_valid_ref,  # SMEM (n_slabs,) int32 — real rows per slab
    q_ref,  # (BLOCK_Q, D)
    bank_ref,  # (CAP, D) — the slab picked by the index_map
    *refs,  # [scale_ref (1, CAP) if row_scale] + outputs + scratch
    k_pad: int,
    cap: int,
    n_probe: int,
    row_scale: bool = False,
):
    if row_scale:
        # (1, CAP) f32 — per-row dequant scales of THIS slab (SQ8):
        # applied in the epilogue so ordering is over dequantized dots
        # (same mechanism as the flat kernel's row_scale).
        scale_ref, *refs = refs
    else:
        scale_ref = None
    (
        vals_out_ref,  # (BLOCK_Q, K_PAD)
        idx_out_ref,  # (BLOCK_Q, K_PAD)
        vals_ref,  # scratch (BLOCK_Q, K_PAD) f32
        idx_ref,  # scratch (BLOCK_Q, K_PAD) i32
        s_ref,  # scratch (BLOCK_Q, CAP) f32
    ) = refs
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        vals_ref[...] = jnp.full_like(vals_ref, NEG_INF)
        idx_ref[...] = jnp.zeros_like(idx_ref)

    slab = leaf_ids_ref[i, j]
    base = slab * cap
    col = jax.lax.broadcasted_iota(jnp.int32, (q_ref.shape[0], cap), 1)
    int8_inputs = q_ref.dtype == jnp.int8
    bank_tile = bank_ref[...]
    if bank_tile.dtype == jnp.int8 and not int8_inputs:
        # Asymmetric scoring: bf16 queries against int8 slab rows (cast
        # per loaded tile) — same mechanism as the flat kernel's asym
        # path; row_scale dequantizes in the epilogue below.
        bank_tile = bank_tile.astype(q_ref.dtype)
    s = jax.lax.dot_general(
        q_ref[...],
        bank_tile,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32 if int8_inputs else jnp.float32,
    )
    if int8_inputs:
        s = s.astype(jnp.float32)
    if row_scale:
        s = s * scale_ref[...]
    s_ref[...] = jnp.where(col < leaf_valid_ref[slab], s, NEG_INF)

    _carry_merge(s_ref, vals_ref, idx_ref, base=base, k_pad=k_pad)

    @pl.when(j == n_probe - 1)
    def _store():
        vals_out_ref[...] = vals_ref[...]
        idx_out_ref[...] = idx_ref[...]


@functools.partial(
    jax.jit,
    static_argnames=("k", "cap", "block_q", "sorted_results", "interpret"),
)
def pallas_ivf_knn(
    queries: jax.Array,
    ivf_bank: jax.Array,
    leaf_ids: jax.Array,
    leaf_valid: jax.Array,
    k: int,
    *,
    cap: int,
    block_q: int = 256,
    sorted_results: bool = True,
    interpret: Optional[bool] = None,
    row_scale: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fused probed-leaf top-k: per query tile, scan only the `n_probe`
    leaf slabs named in `leaf_ids` (dynamic bank tiles via scalar-prefetch
    index_map) with the exact kernel's matmul + carry merge.

    Args:
        queries: (Q, D); Q must be a multiple of block_q * leaf_ids rows
            agreement — i.e. leaf_ids has Q/block_q rows.
        ivf_bank: (n_slabs*cap, D) leaf-contiguous layout (build_ivf_arrays).
        leaf_ids: (Q/block_q, n_probe) int32 slab ids per query tile.
        leaf_valid: (n_slabs,) int32 — real rows in each slab.
        k: neighbours (<=128).
    Returns:
        (values (Q, k) f32, indices (Q, k) int32 — IVF-layout row ids;
        map to original ids with the layout's perm array.)
    """
    q_n, d = queries.shape
    n_tiles, n_probe = leaf_ids.shape
    assert q_n == n_tiles * block_q, (q_n, n_tiles, block_q)
    assert ivf_bank.shape[0] % cap == 0
    assert k <= 128, "k > 128 not supported by the fused kernel"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_pad = max(8, _round_up(k, 8))

    extra_inputs = []
    extra_specs = []
    if row_scale is not None:
        assert ivf_bank.dtype == jnp.int8, "row_scale requires an int8 bank"
        row_scale = row_scale.reshape(-1)
        assert row_scale.shape[0] == ivf_bank.shape[0], (
            row_scale.shape, ivf_bank.shape,
        )
        extra_inputs.append(
            row_scale.astype(jnp.float32).reshape(1, -1)
        )
        extra_specs.append(
            pl.BlockSpec((1, cap), lambda i, j, lids, lvalid: (0, lids[i, j]))
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles, n_probe),
        in_specs=[
            pl.BlockSpec((block_q, d), lambda i, j, lids, lvalid: (i, 0)),
            pl.BlockSpec((cap, d), lambda i, j, lids, lvalid: (lids[i, j], 0)),
            *extra_specs,
        ],
        out_specs=[
            pl.BlockSpec((block_q, k_pad), lambda i, j, *_: (i, 0)),
            pl.BlockSpec((block_q, k_pad), lambda i, j, *_: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, k_pad), jnp.float32),
            pltpu.VMEM((block_q, k_pad), jnp.int32),
            pltpu.VMEM((block_q, cap), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _ivf_kernel, k_pad=k_pad, cap=cap, n_probe=n_probe,
        row_scale=row_scale is not None,
    )
    itemsize = jnp.dtype(queries.dtype).itemsize
    vmem_bytes = (
        2 * (block_q + cap) * d * itemsize
        + 2 * block_q * cap * 4
        + 4 * block_q * k_pad * 8
    )
    vals, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q_n, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((q_n, k_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=min(int(vmem_bytes * 1.5), 100 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * q_n * n_probe * cap * d,
            bytes_accessed=q_n * d * 4 + n_tiles * n_probe * cap * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(leaf_ids, jnp.asarray(leaf_valid, jnp.int32), queries, ivf_bank,
      *extra_inputs)

    if sorted_results or k != k_pad:
        svals, sel = jax.lax.top_k(vals, k)
        sidx = jnp.take_along_axis(idx, sel, axis=-1)
        return svals, sidx
    return vals, idx


# ----------------------------------------------------------------------
# Streamed tree build (round 3): construct the leaf-slab layout from a
# re-iterable stream of row blocks WITHOUT ever holding the flat bank —
# on a 16 GB v5e chip the 10.24M-row int8 flat bank (7.9 GB) plus its
# slab layout (9.1 GB) cannot coexist (measured OOM by 131 MB), and
# .bankdir banks can exceed host RAM outright. Three passes over the
# stream: (1) subsample -> k-means centroids (+ capacity refinement),
# (2) per-block leaf assignment -> host greedy layout, (3) donated
# scatter of each block into the slabs. Peak device memory: slabs + one
# block. Single-device; meshed banks use
# parallel/sharded_ivf.build_ivf_sharded instead (already streaming by
# construction).
# ----------------------------------------------------------------------
def build_tree_streamed(
    slab_stream,
    n_rows: int,
    num_leaves: int,
    *,
    slack: float = 1.3,
    n_choices: int = 3,
    kmeans_iters: int = 12,
    refine_rounds: int = 2,
    sample_rows: int = 131072,
    seed: int = 0,
    mesh=None,
    bank_axis: str = "bank",
):
    """Build IVF arrays from a re-iterable block stream.

    Args:
        slab_stream: zero-arg callable returning an iterator of
            (rows (n, D), labels (n, C) or None) blocks — numpy or
            jax arrays, any row-block sizes. Iterated THREE times
            (sample, assign, scatter); blocks must be identical across
            iterations (seeded generators, bankdir windows, memmaps).
        n_rows: total rows across the stream.
        num_leaves / slack: tree geometry (tree_layout).
        mesh: optional jax Mesh — the slabs are built ROW-SHARDED over
            `bank_axis` (leaf-aligned: n_leaves is rounded up to a
            multiple of the axis size so every shard owns whole leaves),
            each window scattered straight to its owning shard under a
            donated shard_map. Neither the flat bank nor the slab layout
            ever materializes on a single device or on the host, so
            >single-shard banks stream straight onto the mesh.

    Returns dict(ivf_bank, ivf_labels (device), centroids, perm (np),
        slots (np), leaf_fill (np), cap, n_leaves, valid_rows).
    """
    meshed = mesh is not None and mesh.shape.get(bank_axis, 1) > 1
    if meshed:
        p = mesh.shape[bank_axis]
        # Whole leaves per shard (the meshed tree's layout invariant —
        # same rule as bank/io.load_tree_state).
        num_leaves = ((num_leaves + p - 1) // p) * p
    n_leaves, cap = tree_layout(n_rows, num_leaves, slack=slack)
    if meshed and n_leaves % p != 0:
        raise ValueError(
            f"streamed meshed build: {n_rows} rows yields {n_leaves} "
            f"leaves, not divisible by the mesh {bank_axis!r} axis ({p})"
        )
    n_slots = n_leaves * cap

    # Pass 1: subsample -> centroids. The SAME draw as the flat build
    # (search_approx._build_tree: rng.choice over global rows, order
    # preserved) so streamed and flat builds train identical centroids —
    # k-means is init-sensitive, and the init indexes into the sample.
    rng = np.random.default_rng(seed)
    n_sample = min(sample_rows, n_rows)
    sel = rng.choice(n_rows, n_sample, replace=False)  # unsorted, like flat
    sample_buf = None
    pos = 0
    for rows, _ in slab_stream():
        n = rows.shape[0]
        if sample_buf is None:
            sample_buf = np.empty((n_sample, rows.shape[1]), np.float32)
        in_blk = (sel >= pos) & (sel < pos + n)
        if in_blk.any():
            local = sel[in_blk] - pos
            blk = (
                rows[local]
                if isinstance(rows, np.ndarray)
                else rows[jnp.asarray(local)]
            )
            sample_buf[np.where(in_blk)[0]] = np.asarray(blk, np.float32)
        pos += n
    # Catch a short stream HERE, before k-means runs on uninitialized
    # sample_buf rows (np.empty garbage would poison every centroid).
    assert pos == n_rows, (
        f"slab_stream yielded {pos} rows, n_rows says {n_rows}"
    )
    sample = jnp.asarray(sample_buf)
    del sample_buf
    centroids = train_centroids(
        sample, n_leaves, iters=kmeans_iters, key=jax.random.PRNGKey(seed)
    )
    if refine_rounds > 0:
        centroids = refine_centroids_balanced(
            sample, centroids, slack=slack, rounds=refine_rounds
        )
    del sample

    # Pass 2: assignment -> host greedy layout (identical to the flat
    # build: same balanced_layout on the same choices/scores).
    choices = np.empty((n_rows, n_choices), np.int32)
    cscores = np.empty((n_rows, n_choices), np.float32)
    pos = 0
    for rows, _ in slab_stream():
        n = rows.shape[0]
        ch, sc = assign_leaves(rows, centroids, n_choices=n_choices,
                               return_scores=True)
        choices[pos:pos + n], cscores[pos:pos + n] = ch, sc
        pos += n
    assert pos == n_rows, (pos, n_rows)
    slots, fill = balanced_layout(choices, n_leaves, cap, scores=cscores)

    # Pass 3: donated per-block scatter into the slabs. With a mesh the
    # slabs live row-sharded over `bank_axis` from the first window:
    # each shard drops rows outside its slot range (scatter mode='drop'),
    # so a window's rows land only on their owning devices and no device
    # (or the host) ever holds the full slab.
    if meshed:
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard_spec = NamedSharding(mesh, P(bank_axis))
        n_local = n_slots // p

        def _meshed_scatter_f(bank, rows, sl):
            i = jax.lax.axis_index(bank_axis)
            loc = sl - i * n_local
            loc = jnp.where((loc >= 0) & (loc < n_local), loc, n_local)
            return bank.at[loc].set(rows.astype(bank.dtype), mode="drop")

        meshed_scatter = jax.jit(
            jax.shard_map(
                _meshed_scatter_f, mesh=mesh,
                in_specs=(P(bank_axis), P(), P()),
                out_specs=P(bank_axis), check_vma=False,
            ),
            donate_argnums=(0,),
        )

        def _sharded_zeros(shape, dtype):
            return jax.jit(
                lambda: jnp.zeros(shape, dtype), out_shardings=shard_spec
            )()

    ivf_bank = None
    ivf_labels = None
    pos = 0
    for rows, labs in slab_stream():
        n = rows.shape[0]
        rows_j = rows if isinstance(rows, jax.Array) else jnp.asarray(np.asarray(rows))
        if ivf_bank is None:
            if meshed:
                ivf_bank = _sharded_zeros((n_slots, rows_j.shape[1]), rows_j.dtype)
            else:
                ivf_bank = jnp.zeros((n_slots, rows_j.shape[1]), rows_j.dtype)
        sl = jnp.asarray(slots[pos:pos + n], jnp.int32)
        scatter = meshed_scatter if meshed else _scatter_rows
        ivf_bank = scatter(ivf_bank, rows_j, sl)
        if labs is not None:
            labs_j = (
                labs if isinstance(labs, jax.Array)
                else jnp.asarray(np.asarray(labs, np.float32))
            ).astype(jnp.float32)
            if ivf_labels is None:
                if meshed:
                    ivf_labels = _sharded_zeros(
                        (n_slots, labs_j.shape[1]), jnp.float32
                    )
                else:
                    ivf_labels = jnp.zeros((n_slots, labs_j.shape[1]), jnp.float32)
            ivf_labels = scatter(ivf_labels, labs_j, sl)
        pos += n
    if ivf_labels is None:
        ivf_labels = (
            _sharded_zeros((n_slots, 1), jnp.float32)
            if meshed else jnp.zeros((n_slots, 1), jnp.float32)
        )

    perm = np.full((n_slots,), -1, np.int32)
    perm[slots] = np.arange(n_rows, dtype=np.int32)
    return dict(
        ivf_bank=ivf_bank,
        ivf_labels=ivf_labels,
        centroids=centroids,
        perm=perm,
        slots=slots,
        leaf_fill=fill,
        cap=cap,
        n_leaves=n_leaves,
        valid_rows=n_rows,
    )


@functools.partial(jax.jit, donate_argnums=(1, 2))
def _lloyd_accum_block(blk, sums, cnt, c, w):
    """One block's contribution to a Lloyd iteration (donated
    accumulators — no per-block allocations)."""
    x = blk.astype(jnp.float32)
    a = jnp.argmax(x @ c.T, axis=1)
    sums = sums + jax.ops.segment_sum(
        x * w[:, None], a, num_segments=c.shape[0]
    )
    cnt = cnt + jax.ops.segment_sum(w, a, num_segments=c.shape[0])
    return sums, cnt


def full_bank_lloyd(
    bank,
    centroids: jax.Array,
    *,
    iters: int = 2,
    block_rows: int = 1 << 18,
    spherical: bool = True,
) -> jax.Array:
    """Lloyd's k-means over the FULL bank, blockwise — the single-device
    twin of parallel/sharded_ivf.sharded_kmeans (same semantics; a
    CPU-mesh test pins the two equal). Upgrades sample-trained centroids
    when the sample is a small fraction of the bank (131k of 10.24M is
    1.3%). The (rows, n_leaves) score block never exceeds
    block_rows x n_leaves."""
    n_leaves, d = centroids.shape
    c = jnp.asarray(centroids, jnp.float32)
    m = bank.shape[0]
    block_rows = min(block_rows, _round_up(m, 256))
    for _ in range(iters):
        sums = jnp.zeros((n_leaves, d), jnp.float32)
        cnt = jnp.zeros((n_leaves,), jnp.float32)
        for i in range(0, m, block_rows):
            blk = bank[i : i + block_rows]
            n = blk.shape[0]
            w = jnp.ones((block_rows,), jnp.float32)
            if n < block_rows:
                blk = (
                    jnp.pad(blk, ((0, block_rows - n), (0, 0)))
                    if isinstance(blk, jax.Array)
                    else np.pad(np.asarray(blk), ((0, block_rows - n), (0, 0)))
                )
                w = w.at[n:].set(0.0)
            sums, cnt = _lloyd_accum_block(jnp.asarray(blk), sums, cnt, c, w)
        newc = jnp.where(
            cnt[:, None] > 0, sums / jnp.maximum(cnt[:, None], 1.0), c
        )
        if spherical:
            newc = newc / jnp.maximum(
                jnp.linalg.norm(newc, axis=1, keepdims=True), 1e-12
            )
        c = newc
    return c
