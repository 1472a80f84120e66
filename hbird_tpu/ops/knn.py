"""Exact and approximate k-nearest-neighbour search on TPU.

This replaces the reference's Faiss-GPU flat indexes
(reference hbird/nn/search_faiss.py:34-48: GpuIndexFlatIP / GpuIndexFlatL2,
fp16 storage option) and the ScaNN CPU backend
(reference hbird/nn/search_scann.py:18-33) with XLA-native formulations:

- `exact_knn`: blockwise (query-tile x bank-tile) matmul on the MXU with a
  streaming top-k merge carried through a lax.scan — the (Q, M) score
  matrix is never materialized, so bank size is bounded by HBM capacity of
  the bank itself, not of the scores.
- `approx_knn`: same tiling, but per-tile candidates are selected with
  `lax.approx_max_k` (the TPU PartialReduce MIPS primitive — the TPU-native
  analogue of ScaNN's pruned scoring).

Distance measures mirror the reference: "dot_product" (default) and
"l2"/"euclidean" (expanded-norm trick: argmin ||q-b||^2 = argmax q·b - ||b||²/2).

Multi-device bank sharding lives in hbird_tpu/parallel/sharded_knn.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Plain Python float: a jnp scalar here would initialize the XLA backend
# at import time, breaking jax.distributed.initialize for anything that
# imports this module first (see tests/test_distributed_smoke.py).
NEG_INF = float("-inf")


def _pad_rows(x: jax.Array, multiple: int) -> jax.Array:
    m = x.shape[0]
    pad = (-m) % multiple
    if pad == 0:
        return x
    return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))


def _bank_scores(
    q_blk: jax.Array,
    bank_blk: jax.Array,
    l2_bias_blk: Optional[jax.Array],
) -> jax.Array:
    """(Qb, D) x (Bb, D) -> (Qb, Bb) scores, higher = closer."""
    scores = jnp.einsum(
        "qd,bd->qb", q_blk, bank_blk, preferred_element_type=jnp.float32
    )
    if l2_bias_blk is not None:
        # argmin ||q - b||^2 == argmax (q.b - ||b||^2 / 2); the bias is
        # precomputed per bank row.
        scores = scores - l2_bias_blk[None, :]
    return scores


def _merge_topk(
    vals: jax.Array, idx: jax.Array, new_vals: jax.Array, new_idx: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    cand_vals = jnp.concatenate([vals, new_vals], axis=-1)
    cand_idx = jnp.concatenate([idx, new_idx], axis=-1)
    merged_vals, sel = jax.lax.top_k(cand_vals, k)
    merged_idx = jnp.take_along_axis(cand_idx, sel, axis=-1)
    return merged_vals, merged_idx


@functools.partial(
    jax.jit,
    static_argnames=(
        "k",
        "distance",
        "query_block",
        "bank_block",
        "recall_target",
        "approx",
    ),
)
def _knn_impl(
    queries: jax.Array,
    bank: jax.Array,
    valid_rows: jax.Array,
    k: int,
    distance: str,
    query_block: int,
    bank_block: int,
    approx: bool,
    recall_target: float,
) -> Tuple[jax.Array, jax.Array]:
    n_q, d = queries.shape
    l2_bias = None
    if distance in ("l2", "euclidean"):
        l2_bias = 0.5 * jnp.sum(
            bank.astype(jnp.float32) * bank.astype(jnp.float32), axis=-1
        )
    elif distance != "dot_product":
        raise ValueError(f"Unsupported distance measure: {distance}")

    bank_p = _pad_rows(bank, bank_block)
    n_bank_blocks = bank_p.shape[0] // bank_block
    bank_blocks = bank_p.reshape(n_bank_blocks, bank_block, d)
    if l2_bias is not None:
        l2_bias = _pad_rows(l2_bias[:, None], bank_block)[:, 0]
        l2_blocks = l2_bias.reshape(n_bank_blocks, bank_block)
    else:
        l2_blocks = jnp.zeros((n_bank_blocks, bank_block), jnp.float32)

    q_p = _pad_rows(queries, query_block)
    n_q_blocks = q_p.shape[0] // query_block
    q_blocks = q_p.reshape(n_q_blocks, query_block, d)

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, bank_block), 1)
    block_starts = jnp.arange(n_bank_blocks, dtype=jnp.int32) * bank_block

    def per_query_block(q_blk):
        def body(carry, blk):
            vals, idx = carry
            b_feats, b_bias, b_start = blk
            scores = _bank_scores(q_blk, b_feats, b_bias if l2_bias is not None else None)
            col = col_iota + b_start
            scores = jnp.where(col < valid_rows, scores, NEG_INF)
            if approx:
                b_vals, b_idx = jax.lax.approx_max_k(
                    scores, k, recall_target=recall_target
                )
            else:
                b_vals, b_idx = jax.lax.top_k(scores, k)
            vals, idx = _merge_topk(vals, idx, b_vals, b_idx + b_start, k)
            return (vals, idx), None

        init = (
            jnp.full((query_block, k), NEG_INF, jnp.float32),
            jnp.zeros((query_block, k), jnp.int32),
        )
        (vals, idx), _ = jax.lax.scan(
            body, init, (bank_blocks, l2_blocks, block_starts)
        )
        return vals, idx

    vals, idx = jax.lax.map(per_query_block, q_blocks)
    vals = vals.reshape(-1, k)[:n_q]
    idx = idx.reshape(-1, k)[:n_q]
    return vals, idx


def exact_knn(
    queries: jax.Array,
    bank: jax.Array,
    k: int,
    *,
    distance: str = "dot_product",
    valid_rows: Optional[int | jax.Array] = None,
    query_block: int = 1024,
    bank_block: int = 8192,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k neighbours of each query in the bank.

    Args:
        queries: (Q, D). NOT normalized (parity with reference
            hbird/hbird_eval.py:611-630 — queries are sent raw).
        bank: (M, D) memory bank (rows may be padded; see valid_rows).
        k: neighbours per query.
        distance: "dot_product" (default, parity with faiss backend default)
            or "l2"/"euclidean".
        valid_rows: number of real rows in `bank` (defaults to M). Padded
            rows never win.
        query_block / bank_block: tile sizes.

    Returns:
        (values, indices): each (Q, k); values are dot-product scores
        (or -||q-b||²/2 + const for l2 — ordering-equivalent), indices are
        bank row ids. Ties broken by lowest index (lax.top_k is stable).
    """
    if valid_rows is None:
        valid_rows = bank.shape[0]
    valid_rows = jnp.asarray(valid_rows, jnp.int32)
    return _knn_impl(
        queries,
        bank,
        valid_rows,
        k=k,
        distance=distance,
        query_block=min(query_block, max(8, queries.shape[0])),
        bank_block=min(bank_block, max(128, bank.shape[0])),
        approx=False,
        recall_target=1.0,
    )


def approx_knn(
    queries: jax.Array,
    bank: jax.Array,
    k: int,
    *,
    distance: str = "dot_product",
    valid_rows: Optional[int | jax.Array] = None,
    recall_target: float = 0.95,
    query_block: int = 1024,
    bank_block: int = 8192,
) -> Tuple[jax.Array, jax.Array]:
    """Approximate top-k via the TPU PartialReduce primitive (lax.approx_max_k).

    The TPU-native analogue of the reference's ScaNN backend
    (hbird/nn/search_scann.py:18-33): candidates are selected with a
    hardware-friendly binned partial reduction at a configurable recall
    target instead of a full sort.
    """
    if valid_rows is None:
        valid_rows = bank.shape[0]
    valid_rows = jnp.asarray(valid_rows, jnp.int32)
    return _knn_impl(
        queries,
        bank,
        valid_rows,
        k=k,
        distance=distance,
        query_block=min(query_block, max(8, queries.shape[0])),
        bank_block=min(bank_block, max(128, bank.shape[0])),
        approx=True,
        recall_target=float(recall_target),
    )


@functools.partial(jax.jit, static_argnames=("k", "query_block"))
def rerank_exact(
    queries: jax.Array,
    bank: jax.Array,
    cand_idx: jax.Array,
    k: int,
    query_block: int = 512,
    cand_valid: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact re-scoring of candidate rows (ScaNN `reorder` semantics,
    reference hbird/nn/search_scann.py:32).

    Args:
        queries: (Q, D) full-precision queries.
        bank: (M, D) full/half-precision bank (the re-scoring table).
        cand_idx: (Q, C) candidate row ids from a fast/quantized scan.
        k: final neighbours (k <= C).
        cand_valid: optional (Q, C) bool mask of real candidates. When a
            bank (or shard) has fewer valid rows than C, the first pass
            emits NEG_INF-masked filler indices; without the mask those
            filler rows would be re-scored at their true dot products and
            could (wrongly) win. Invalid candidates score NEG_INF here.

    Returns:
        (values, indices): (Q, k) exact dot-product scores + row ids,
        descending. Streamed over query blocks: the (block, C, D) candidate
        gather never exceeds ~100 MB.
    """
    q_n, d = queries.shape
    c = cand_idx.shape[1]
    qb = min(query_block, max(8, q_n))
    pad = (-q_n) % qb
    if pad:
        queries = jnp.pad(queries, ((0, pad), (0, 0)))
        cand_idx = jnp.pad(cand_idx, ((0, pad), (0, 0)))
        if cand_valid is not None:
            cand_valid = jnp.pad(cand_valid, ((0, pad), (0, 0)))
    n_blocks = queries.shape[0] // qb
    if cand_valid is None:
        cand_valid = jnp.ones(cand_idx.shape, jnp.bool_)

    def body(_, blk):
        q_blk, idx_blk, valid_blk = blk
        cand = jnp.take(bank, idx_blk, axis=0).astype(q_blk.dtype)  # (qb, C, D)
        scores = jnp.einsum(
            "qd,qcd->qc", q_blk, cand, preferred_element_type=jnp.float32
        )
        scores = jnp.where(valid_blk, scores, NEG_INF)
        vals, sel = jax.lax.top_k(scores, k)
        return None, (vals, jnp.take_along_axis(idx_blk, sel, axis=-1))

    _, (vals, idx) = jax.lax.scan(
        body,
        None,
        (
            queries.reshape(n_blocks, qb, d),
            cand_idx.reshape(n_blocks, qb, c),
            cand_valid.reshape(n_blocks, qb, c),
        ),
    )
    return vals.reshape(-1, k)[:q_n], idx.reshape(-1, k)[:q_n]


def knn_search(method: str, *args, **kwargs):
    """Dispatch by method name ('exact'/'faiss' -> exact, 'approx'/'scann' -> approx)."""
    m = method.lower()
    if m in ("exact", "faiss", "flat"):
        return exact_knn(*args, **kwargs)
    if m in ("approx", "scann", "partial_reduce"):
        return approx_knn(*args, **kwargs)
    raise ValueError(f"Unknown kNN method: {method}")
