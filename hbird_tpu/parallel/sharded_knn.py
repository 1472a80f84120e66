"""Mesh-sharded exact kNN with fused neighbour-label fetch.

The TPU-native replacement for Faiss IndexShards (reference
hbird/nn/search_faiss.py:53-63): bank rows live sharded across the mesh's
'bank' axis; each device scores the (replicated) queries against its
resident shard with the blockwise MXU kernel, then:

1. all_gather the per-shard top-k values and global indices — small:
   (n_shards, Q, k) — NOT the scores or the bank;
2. every device computes the identical global top-k merge;
3. neighbour soft labels are fetched with a masked psum: each shard
   contributes the label rows of the winners it owns, zeros elsewhere.
   This keeps per-shard label tables local and moves only (Q, k, C).

Because bank rows are L2-normalized, downstream cross-attention needs only
(values, labels) — neighbour feature vectors never cross the ICI
(see hbird_tpu/core/attention.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hbird_tpu.ops.knn import NEG_INF, _merge_topk, exact_knn, approx_knn


def pad_rows_for_mesh(n_rows: int, n_shards: int, block: int = 8) -> int:
    """Rows after padding so each shard gets an equal, aligned slice."""
    per_shard = -(-n_rows // n_shards)
    per_shard = ((per_shard + block - 1) // block) * block
    return per_shard * n_shards


def shard_bank(
    bank, labels, mesh: Mesh, bank_axis: str = "bank"
) -> Tuple[jax.Array, jax.Array, int]:
    """Place (bank, labels) row-sharded over the mesh's bank axis.

    Returns (bank_sharded, labels_sharded, valid_rows). Rows are zero-padded
    to an equal per-shard size; padded rows are masked out during search.

    Device-resident inputs (jax.Array) pad with jnp.pad and reshard over
    the ICI — no host round-trip. Host inputs pad in numpy and transfer
    shard-wise.
    """
    import numpy as np

    n_shards = mesh.shape[bank_axis]
    valid = bank.shape[0]
    padded = pad_rows_for_mesh(valid, n_shards)
    spec = NamedSharding(mesh, P(bank_axis))

    def place(arr):
        if isinstance(arr, jax.Array):
            if padded != valid:
                arr = jnp.pad(arr, ((0, padded - valid), (0, 0)))
            return jax.device_put(arr, spec)
        arr = np.asarray(arr)
        if padded != valid:
            arr = np.concatenate(
                [arr, np.zeros((padded - valid, arr.shape[1]), arr.dtype)]
            )
        return jax.device_put(arr, spec)

    return place(bank), place(labels), valid


def sharded_knn_with_labels(
    queries: jax.Array,
    bank: jax.Array,
    labels: jax.Array,
    k: int,
    *,
    mesh: Optional[Mesh] = None,
    bank_axis: str = "bank",
    valid_rows: Optional[int | jax.Array] = None,
    distance: str = "dot_product",
    approx: bool = False,
    recall_target: float = 0.95,
    query_block: int = 1024,
    bank_block: int = 8192,
    kernel: str = "xla",
    rerank_bank: Optional[jax.Array] = None,
    rerank_queries: Optional[jax.Array] = None,
    rerank_candidates: int = 0,
    row_scale: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Top-k search + label gather, single-device or mesh-sharded.

    Args:
        queries: (Q, D), replicated across the bank axis.
        bank: (M, D); row-sharded over `bank_axis` when mesh is given.
        labels: (M, C) soft labels, sharded like bank.
        k: neighbours.
        mesh: optional Mesh with a `bank_axis` axis. None = single-shard.
        valid_rows: real row count (padding masked out).
        rerank_bank / rerank_queries / rerank_candidates: ScaNN-style exact
            re-ordering — scan for `rerank_candidates` with the (fast,
            possibly quantized) bank, then re-score those candidates with
            the full-precision rerank_bank and rerank_queries before taking
            the final k. Runs per shard, before the merge.
        row_scale: optional (M,) or (M, 1) f32 per-row dequant scales for
            an int8 bank (SQ8), sharded like the bank; pallas kernel only.

    Returns:
        values: (Q, k) dot-product scores, globally merged, descending.
        indices: (Q, k) global bank row ids.
        neighbour_labels: (Q, k, C).
    """
    if valid_rows is None:
        valid_rows = bank.shape[0]
    valid_rows = jnp.asarray(valid_rows, jnp.int32)
    if kernel == "auto":
        # The fused Pallas kernel beats the XLA blockwise path ~7x on v5e
        # (the lax.top_k merge dominates the XLA version); use it whenever
        # it applies (dot product and expanded-norm l2).
        kernel = (
            "pallas"
            if (not approx and distance in ("dot_product", "l2", "euclidean"))
            else "xla"
        )
    if kernel == "pallas" and not approx:
        if distance not in ("dot_product", "l2", "euclidean"):
            raise ValueError(
                f"pallas kernel does not support distance={distance!r}"
            )
        from hbird_tpu.ops.knn_pallas import pallas_knn

        def search(q, b, k_, valid_rows, row_scale_l=None, **_):
            return pallas_knn(
                q, b, k_, valid_rows=valid_rows,
                block_q=query_block, block_m=bank_block,
                distance=distance, row_scale=row_scale_l,
            )

        search_kwargs = {}
    else:
        assert row_scale is None, (
            "row_scale (per-row int8) requires the pallas kernel"
        )

        def search(q, b, k_, valid_rows, row_scale_l=None, **kw):
            fn = approx_knn if approx else exact_knn
            return fn(q, b, k_, valid_rows=valid_rows, **kw)

        search_kwargs = dict(
            distance=distance, query_block=query_block, bank_block=bank_block
        )
        if approx:
            search_kwargs["recall_target"] = recall_target
    if row_scale is not None:
        row_scale = row_scale.reshape(-1)

    # A shard can hold fewer valid rows than the candidate count; first-pass
    # filler candidates (score -inf) must not be re-scored as real rows.
    def _cand_valid(cand_vals, cand_idx, n_valid):
        return jnp.isfinite(cand_vals) & (cand_idx < n_valid)

    do_rerank = rerank_bank is not None and rerank_candidates > k
    if do_rerank:
        from hbird_tpu.ops.knn import rerank_exact

        # Never request more candidates than the bank can supply.
        rerank_candidates = min(rerank_candidates, bank.shape[0])
        do_rerank = rerank_candidates > k
    if do_rerank and rerank_queries is None:
        rerank_queries = queries

    if mesh is None or mesh.shape.get(bank_axis, 1) == 1:
        if do_rerank:
            cvals, cand = search(
                queries, bank, rerank_candidates, valid_rows=valid_rows,
                row_scale_l=row_scale, **search_kwargs,
            )
            vals, idx = rerank_exact(
                rerank_queries, rerank_bank, cand, k,
                cand_valid=_cand_valid(cvals, cand, valid_rows),
            )
        else:
            vals, idx = search(
                queries, bank, k, valid_rows=valid_rows,
                row_scale_l=row_scale, **search_kwargs,
            )
        return vals, idx, jnp.take(labels, idx, axis=0)

    n_shards = mesh.shape[bank_axis]
    assert bank.shape[0] % n_shards == 0, "bank rows must divide the bank axis"
    shard_rows = bank.shape[0] // n_shards
    # Per-shard candidate budget: a shard can supply at most shard_rows
    # candidates; keep >= k so every shard still reranks (merged values must
    # all be on the full-precision scale).
    local_c = max(k, min(rerank_candidates, shard_rows)) if do_rerank else 0

    def local_search(q, bank_l, labels_l, valid_total, *extra_args):
        i = jax.lax.axis_index(bank_axis)
        start = (i * shard_rows).astype(jnp.int32)
        local_valid = jnp.clip(valid_total[0] - start, 0, shard_rows)
        extra = list(extra_args)
        rs_l = extra.pop(0) if row_scale is not None else None
        if do_rerank:
            q_r, rbank_l = extra
            cvals, cand = search(
                q, bank_l, local_c, valid_rows=local_valid,
                row_scale_l=rs_l, **search_kwargs,
            )
            vals_l, idx_l = rerank_exact(
                q_r, rbank_l, cand, k,
                cand_valid=_cand_valid(cvals, cand, local_valid),
            )
        else:
            vals_l, idx_l = search(
                q, bank_l, k, valid_rows=local_valid,
                row_scale_l=rs_l, **search_kwargs,
            )
        gidx_l = idx_l + start

        # Merge: gather the tiny (k per shard) candidate lists everywhere.
        vals_g = jax.lax.all_gather(vals_l, bank_axis)  # (n, Q, k)
        gidx_g = jax.lax.all_gather(gidx_l, bank_axis)
        q_n = vals_g.shape[1]
        cand_vals = vals_g.transpose(1, 0, 2).reshape(q_n, n_shards * k)
        cand_idx = gidx_g.transpose(1, 0, 2).reshape(q_n, n_shards * k)
        merged_vals, sel = jax.lax.top_k(cand_vals, k)
        merged_idx = jnp.take_along_axis(cand_idx, sel, axis=-1)

        # Label fetch via masked psum: only the owning shard contributes.
        mine = (merged_idx >= start) & (merged_idx < start + shard_rows)
        rows = jnp.where(mine, merged_idx - start, 0)
        contrib = jnp.where(mine[..., None], jnp.take(labels_l, rows, axis=0), 0.0)
        merged_labels = jax.lax.psum(contrib, bank_axis)
        return merged_vals, merged_idx, merged_labels

    in_specs = [
        P(*[None] * queries.ndim),  # queries replicated
        P(bank_axis),
        P(bank_axis),
        P(),  # valid rows scalar
    ]
    args = [queries, bank, labels, valid_rows.reshape(1)]
    if row_scale is not None:
        in_specs.append(P(bank_axis))
        args.append(row_scale)
    if do_rerank:
        in_specs += [P(None, None), P(bank_axis)]
        args += [rerank_queries, rerank_bank]
    out_specs = (P(), P(), P())
    fn = jax.shard_map(
        local_search,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=out_specs,
        check_vma=False,
    )
    return fn(*args)


def ring_knn_with_labels(
    queries: jax.Array,
    bank: jax.Array,
    labels: jax.Array,
    k: int,
    *,
    mesh: Mesh,
    bank_axis: str = "bank",
    valid_rows: Optional[int | jax.Array] = None,
    distance: str = "dot_product",
    kernel: str = "xla",
    query_block: int = 1024,
    bank_block: int = 8192,
    query_partition: Optional[Tuple[str, ...]] = None,
    rerank_bank: Optional[jax.Array] = None,
    rerank_queries: Optional[jax.Array] = None,
    rerank_candidates: int = 0,
    row_scale: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Query-sharded ring search: nothing is replicated across the mesh.

    The all-gather merge (`sharded_knn_with_labels`) replicates the full
    query set on every bank shard — at full-VOC scale (~2M queries x 8
    chips) that is 8x redundant query HBM plus an avoidable all_gather.
    Here queries are sharded too: each device holds Q/n queries and M/n
    bank rows, and query BLOCKS rotate around the `bank_axis` ring via
    ppermute, carrying their running top-k:

        step s: score the visiting block against the resident shard,
                merge into the block's carried (values, global ids),
                forward block+carry to the next device.

    After n steps every block has visited every shard and is back home
    with its complete top-k. A second n-step ring accumulates neighbour
    soft labels: each device adds the label rows it owns. Per-device HBM
    is Q/n + M/n; total ICI traffic matches one all_gather of the queries
    but is pipelined and never materialized.

    The retrieval analogue of ring attention, replacing Faiss IndexShards
    semantics (reference hbird/nn/search_faiss.py:53-63) without the
    replicated-query cost.

    Args:
        queries: (Q, D) logical array (any placement; shard_map reshards).
        bank / labels: (M, D) / (M, C), row-sharded over `bank_axis`.
        query_partition: mesh axes partitioning the query dim (default
            (bank_axis,); pass ('data', 'bank') on a 2D mesh so each data
            row runs its own ring).
        rerank_bank / rerank_queries / rerank_candidates: ScaNN reorder(C)
            per hop — the visiting block scans the resident (possibly
            quantized) shard for C candidates, exact-rescales them against
            the resident full-precision rerank shard, and merges the
            top-k. The full-precision query block travels the ring along
            with the scan block.

    Returns:
        (values, indices, neighbour_labels): (Q, k), (Q, k), (Q, k, C) —
        logically full-size, device-sharded over `query_partition`.
    """
    n = mesh.shape[bank_axis]
    assert bank.shape[0] % n == 0, "bank rows must divide the bank axis"
    shard_rows = bank.shape[0] // n
    if valid_rows is None:
        valid_rows = bank.shape[0]
    valid_rows = jnp.asarray(valid_rows, jnp.int32)
    parts = tuple(query_partition or (bank_axis,))
    total_parts = 1
    for a in parts:
        total_parts *= mesh.shape[a]

    do_rerank = rerank_bank is not None and rerank_candidates > k
    if do_rerank and rerank_queries is None:
        rerank_queries = queries
    local_c = max(k, min(rerank_candidates, shard_rows)) if do_rerank else 0

    q_n = queries.shape[0]
    pad = (-q_n) % total_parts
    if pad:
        queries = jnp.pad(queries, ((0, pad), (0, 0)))
        if do_rerank:
            rerank_queries = jnp.pad(rerank_queries, ((0, pad), (0, 0)))

    if kernel == "pallas":
        if distance not in ("dot_product", "l2", "euclidean"):
            raise ValueError(
                f"pallas kernel does not support distance={distance!r}"
            )
        from hbird_tpu.ops.knn_pallas import pallas_knn

        def search(q, b, k_, valid_rows, rs=None):
            # l2 bias (||b||²/2) is recomputed per ring hop from the
            # resident shard — one cheap fused pass per hop.
            return pallas_knn(
                q, b, k_, valid_rows=valid_rows,
                block_q=query_block, block_m=bank_block,
                distance=distance, row_scale=rs,
            )
    else:
        assert row_scale is None, (
            "row_scale (per-row int8) requires the pallas kernel"
        )

        def search(q, b, k_, valid_rows, rs=None):
            return exact_knn(
                q, b, k_, distance=distance, valid_rows=valid_rows,
                query_block=query_block, bank_block=bank_block,
            )
    if row_scale is not None:
        row_scale = row_scale.reshape(-1)

    perm = [(d, (d + 1) % n) for d in range(n)]

    def local(q, bank_l, labels_l, valid_total, *extra_args):
        i = jax.lax.axis_index(bank_axis)
        start = (i * shard_rows).astype(jnp.int32)
        local_valid = jnp.clip(valid_total[0] - start, 0, shard_rows)
        nc = labels_l.shape[1]
        extra = list(extra_args)
        # Resident per-shard dequant scales (never rotated: the bank
        # stays home, so do its scales).
        rs_l = extra.pop(0) if row_scale is not None else None
        if do_rerank:
            q_r0, rbank_l = extra
        else:
            q_r0, rbank_l = q[:, :0], None  # zero-width placeholder travels free

        def score_body(_, carry):
            q_c, q_r, vals, idx = carry
            if do_rerank:
                from hbird_tpu.ops.knn import rerank_exact

                cvals, cand = search(q_c, bank_l, local_c, local_valid, rs_l)
                cand_ok = jnp.isfinite(cvals) & (cand < local_valid)
                b_vals, b_idx = rerank_exact(
                    q_r, rbank_l, cand, k, cand_valid=cand_ok
                )
            else:
                b_vals, b_idx = search(q_c, bank_l, k, local_valid, rs_l)
            vals, idx = _merge_topk(vals, idx, b_vals, b_idx + start, k)
            q_c = jax.lax.ppermute(q_c, bank_axis, perm)
            q_r = jax.lax.ppermute(q_r, bank_axis, perm)
            vals = jax.lax.ppermute(vals, bank_axis, perm)
            idx = jax.lax.ppermute(idx, bank_axis, perm)
            return q_c, q_r, vals, idx

        init = (
            q,
            q_r0,
            jnp.full((q.shape[0], k), NEG_INF, jnp.float32),
            jnp.zeros((q.shape[0], k), jnp.int32),
        )
        _, _, vals, idx = jax.lax.fori_loop(0, n, score_body, init)

        def label_body(_, carry):
            idx_c, lab = carry
            mine = (idx_c >= start) & (idx_c < start + shard_rows)
            rows = jnp.where(mine, idx_c - start, 0)
            contrib = jnp.where(
                mine[..., None],
                jnp.take(labels_l, rows, axis=0).astype(jnp.float32),
                0.0,
            )
            lab = lab + contrib
            idx_c = jax.lax.ppermute(idx_c, bank_axis, perm)
            lab = jax.lax.ppermute(lab, bank_axis, perm)
            return idx_c, lab

        lab0 = jnp.zeros(idx.shape + (nc,), jnp.float32)
        idx_home, lab = jax.lax.fori_loop(0, n, label_body, (idx, lab0))
        return vals, idx_home, lab

    in_specs = [P(parts), P(bank_axis), P(bank_axis), P()]
    args = [queries, bank, labels, valid_rows.reshape(1)]
    if row_scale is not None:
        in_specs.append(P(bank_axis))
        args.append(row_scale)
    if do_rerank:
        in_specs += [P(parts), P(bank_axis)]
        args += [rerank_queries, rerank_bank]
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(parts), P(parts), P(parts)),
        check_vma=False,
    )
    vals, idx, lab = fn(*args)
    if pad:
        vals, idx, lab = vals[:q_n], idx[:q_n], lab[:q_n]
    return vals, idx, lab
