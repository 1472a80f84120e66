"""Pallas fused matmul + streaming-top-k kNN kernel.

The performance core of the framework: replaces Faiss GpuIndexFlat*
(reference hbird/nn/search_faiss.py:34-48) with a single TPU kernel that
never materializes the (Q, M) score matrix in HBM.

Kernel structure (see /opt/skills/guides/pallas_guide.md):
- grid = (Q tiles, bank tiles); the bank dimension is innermost and
  "arbitrary" (sequential reduction), Q tiles are "parallel" (megacores).
- per step: scores = q_tile @ bank_tileᵀ on the MXU (f32 accumulation),
  then a replace-min insertion merge into a running top-k held in VMEM
  scratch (values + global indices), analogous to flash attention's
  running (m, l, acc) statistics.
- the merge loop is PREDICATED on `tile_max > running_min`: once the
  running k-th best exceeds everything in a tile (the common case after a
  few tiles), the tile costs one row-max pass on the VPU beyond its
  matmul.
- outputs are unsorted top-k (softmax label transfer is order-invariant);
  `pallas_knn(..., sorted=True)` applies a final (Q, k) lax.top_k for the
  Faiss-parity sorted API.

Scale note: on a mesh, this kernel runs per bank shard inside
hbird_tpu/parallel/sharded_knn.py's shard_map.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bucket_merge_rounds(
    s_ref, vals_ref, idx_ref, cvals_ref, ccols_ref, ins_ref,
    *, base, nb, bucket_len, k_pad,
):
    """Tournament ("group-max") extraction: up to nb candidates per round.

    The single-extraction merge pays ~3 full-width (Q, BLOCK_M) VPU passes
    PER top-k insertion; early bank tiles insert up to k_pad times. Here
    each ROUND costs ~3 full-width passes + nb narrow (Q, nb) passes and
    inserts up to nb candidates (one per bucket):

      1. reduce the tile to per-bucket maxima + their columns (full pass),
      2. insert bucket maxima into the running top-k in descending order
         (narrow passes only),
      3. knock all inserted elements out of the tile in ONE masked write,
      4. repeat while any bucket still beats the running k-th best
         (only when 2+ top-k members share a bucket).
    """
    q = s_ref.shape[0]
    big = jnp.int32(2**30)
    # Mosaic cannot shape-cast (Q, M) -> (Q, nb, L); buckets are STATIC
    # column slices instead (the loops unroll at trace time).
    l2 = jax.lax.broadcasted_iota(jnp.int32, (q, bucket_len), 1)
    cand_ids = jax.lax.broadcasted_iota(jnp.int32, (q, nb), 1)
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, vals_ref.shape, 1)

    def round_body(_r):
        # 1. per-bucket maxima + their global columns (one tile pass).
        for b in range(nb):
            sl = s_ref[:, pl.ds(b * bucket_len, bucket_len)]
            bm = jnp.max(sl, axis=1, keepdims=True)  # (Q, 1)
            bc = jnp.min(
                jnp.where(sl >= bm, l2, big), axis=1, keepdims=True
            )  # local column, lowest on ties
            cvals_ref[:, b : b + 1] = bm
            ccols_ref[:, b : b + 1] = base + b * bucket_len + bc
        ins_ref[...] = jnp.zeros_like(ins_ref)

        def ins_cond(i):
            return jnp.logical_and(
                i < nb,
                jnp.any(
                    jnp.max(cvals_ref[...], axis=1)
                    > jnp.min(vals_ref[...], axis=1)
                ),
            )

        def ins_body(i):
            cv = cvals_ref[...]
            run_min = jnp.min(vals_ref[...], axis=1, keepdims=True)
            cmax = jnp.max(cv, axis=1, keepdims=True)
            better = cmax > run_min
            csel = jnp.min(
                jnp.where(cv >= cmax, cand_ids, big), axis=1, keepdims=True
            )
            sel_col = jnp.min(
                jnp.where(cand_ids == csel, ccols_ref[...], big),
                axis=1, keepdims=True,
            )
            min_slot = jnp.min(
                jnp.where(vals_ref[...] <= run_min, slot_ids, big),
                axis=1, keepdims=True,
            )
            do = better & (slot_ids == min_slot)
            vals_ref[...] = jnp.where(do, cmax, vals_ref[...])
            idx_ref[...] = jnp.where(do, sel_col, idx_ref[...])
            picked = better & (cand_ids == csel)
            ins_ref[...] = jnp.where(picked, jnp.int32(1), ins_ref[...])
            cvals_ref[...] = jnp.where(picked, NEG_INF, cv)
            return i + 1

        jax.lax.while_loop(ins_cond, ins_body, jnp.int32(0))

        # 3. knock every inserted element out of the tile (one tile pass,
        # static bucket slices).
        for b in range(nb):
            sl = s_ref[:, pl.ds(b * bucket_len, bucket_len)]
            local = ccols_ref[:, b : b + 1] - (base + b * bucket_len)
            knock = (ins_ref[:, b : b + 1] == 1) & (l2 == local)
            s_ref[:, pl.ds(b * bucket_len, bucket_len)] = jnp.where(
                knock, NEG_INF, sl
            )
        return _r + 1

    def round_cond(r):
        return jnp.logical_and(
            r < k_pad,
            jnp.any(
                jnp.max(s_ref[...], axis=1) > jnp.min(vals_ref[...], axis=1)
            ),
        )

    jax.lax.while_loop(round_cond, round_body, jnp.int32(0))


def _carry_merge(s_ref, vals_ref, idx_ref, *, base, k_pad):
    """Single-extraction insertion merge with the tile max CARRIED between
    iterations: the classic loop re-reads + re-maxes the full tile in the
    cond AND the body (Mosaic does not CSE across the while boundary);
    here each extraction costs one tile read and one knockout write, with
    the next max computed from the already-loaded (knocked-out) value.
    Measured fastest of the four merge variants on v5e (TODO.md).

    `base` is the global row id of the tile's first column (a traced
    scalar is fine — the IVF kernel passes slab_id * cap).
    """
    q, block_m = s_ref.shape
    col_l = jax.lax.broadcasted_iota(jnp.int32, (q, block_m), 1)
    big = jnp.int32(2**30)
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, vals_ref.shape, 1)
    m0 = jnp.max(s_ref[...], axis=1, keepdims=True)  # (Q, 1)

    def cond(carry):
        i, cur_max = carry
        run_min = jnp.min(vals_ref[...], axis=1, keepdims=True)
        return jnp.logical_and(i < k_pad, jnp.any(cur_max > run_min))

    def body(carry):
        i, cur_max = carry
        s_cur = s_ref[...]  # one tile read per extraction
        run_min = jnp.min(vals_ref[...], axis=1, keepdims=True)
        better = cur_max > run_min
        cand_col = jnp.min(
            jnp.where(s_cur >= cur_max, col_l, big), axis=1, keepdims=True
        )
        min_slot = jnp.min(
            jnp.where(vals_ref[...] <= run_min, slot_ids, big),
            axis=1, keepdims=True,
        )
        do = better & (slot_ids == min_slot)
        vals_ref[...] = jnp.where(do, cur_max, vals_ref[...])
        idx_ref[...] = jnp.where(do, cand_col + base, idx_ref[...])
        knocked = jnp.where(
            (col_l == cand_col) & better, NEG_INF, s_cur
        )
        s_ref[...] = knocked  # one tile write
        new_max = jnp.max(knocked, axis=1, keepdims=True)  # from value
        return i + 1, new_max

    @pl.when(jnp.any(m0 > jnp.min(vals_ref[...], axis=1, keepdims=True)))
    def _merge_carry():
        jax.lax.while_loop(cond, body, (jnp.int32(0), m0))


def _carry_nw_merge(s_ref, vals_ref, idx_ref, *, base, k_pad):
    """No-write insertion merge: the knockout WRITE (8 MB of VMEM traffic
    per extraction at 256x8192 f32) is replaced by LEXICOGRAPHIC
    exclusion — the next candidate is the max over elements strictly
    below the last extracted (value, col) pair, so the scores tile is
    only ever READ. Extraction order for tied values is ascending col,
    identical to the knockout variants' lowest-col-first order.

    Motivation (round 3 cost model): carry's per-extraction cost
    measured ~18.5 us = tile read + knockout write + reduction passes;
    dropping the write removes ~8 MB/extraction of VMEM traffic.
    """
    q, block_m = s_ref.shape
    col_l = jax.lax.broadcasted_iota(jnp.int32, (q, block_m), 1)
    big = jnp.int32(2**30)
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, vals_ref.shape, 1)

    s0 = s_ref[...]
    m0 = jnp.max(s0, axis=1, keepdims=True)  # (Q, 1)
    c0 = jnp.min(jnp.where(s0 >= m0, col_l, big), axis=1, keepdims=True)

    def cond(carry):
        i, cur_v, _cur_c = carry
        run_min = jnp.min(vals_ref[...], axis=1, keepdims=True)
        return jnp.logical_and(i < k_pad, jnp.any(cur_v > run_min))

    def body(carry):
        i, cur_v, cur_c = carry
        run_min = jnp.min(vals_ref[...], axis=1, keepdims=True)
        better = cur_v > run_min
        min_slot = jnp.min(
            jnp.where(vals_ref[...] <= run_min, slot_ids, big),
            axis=1, keepdims=True,
        )
        do = better & (slot_ids == min_slot)
        vals_ref[...] = jnp.where(do, cur_v, vals_ref[...])
        idx_ref[...] = jnp.where(do, cur_c + base, idx_ref[...])
        # Next candidate: max over elements lexicographically below
        # (cur_v, cur_c) — one streaming traversal, no write-back.
        s = s_ref[...]
        elig = (s < cur_v) | ((s == cur_v) & (col_l > cur_c))
        sm = jnp.where(elig, s, NEG_INF)
        nv = jnp.max(sm, axis=1, keepdims=True)
        nc = jnp.min(jnp.where(sm >= nv, col_l, big), axis=1, keepdims=True)
        return i + 1, nv, nc

    @pl.when(jnp.any(m0 > jnp.min(vals_ref[...], axis=1, keepdims=True)))
    def _merge_nw():
        jax.lax.while_loop(cond, body, (jnp.int32(0), m0, c0))


def _knn_kernel(
    valid_ref,  # SMEM (1,) int32 — number of real bank rows
    q_ref,  # (BLOCK_Q, D)
    bank_ref,  # (BLOCK_M, D)
    *refs,  # [bias_ref (1, BLOCK_M) if l2] + outputs + scratch
    k_pad: int,
    block_m: int,
    n_bank_tiles: int,
    merge_chunk: int,
    merge_mode: str,
    n_buckets: int,
    l2: bool = False,
    row_scale: bool = False,
):
    if l2:
        bias_ref, *refs = refs  # (1, BLOCK_M) f32 — precomputed ||b||²/2
    else:
        bias_ref = None
    if row_scale:
        # (1, BLOCK_M) f32 — per-bank-row dequantization scales (SQ8:
        # each int8 row carries its own scale, the cheap core of ScaNN's
        # asymmetric hashing, reference search_scann.py:29-30). Applied
        # in the epilogue so ORDERING reflects dequantized dot products.
        scale_ref, *refs = refs
    else:
        scale_ref = None
    (
        vals_out_ref,  # (BLOCK_Q, K_PAD)
        idx_out_ref,  # (BLOCK_Q, K_PAD)
        vals_ref,  # scratch (BLOCK_Q, K_PAD) f32
        idx_ref,  # scratch (BLOCK_Q, K_PAD) i32
        s_ref,  # scratch (BLOCK_Q, BLOCK_M) f32 — mutable scores tile
        cvals_ref,  # scratch (BLOCK_Q, NB) f32 — bucket-merge candidates
        ccols_ref,  # scratch (BLOCK_Q, NB) i32
        ins_ref,  # scratch (BLOCK_Q, NB) i32
    ) = refs
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        vals_ref[...] = jnp.full_like(vals_ref, NEG_INF)
        idx_ref[...] = jnp.zeros_like(idx_ref)

    # ── scores tile on the MXU, written to a mutable VMEM scratch so the
    # merge loop can knock out extracted candidates in place (no functional
    # copies of the tile inside the while_loop) ──
    base = j * block_m
    col = jax.lax.broadcasted_iota(jnp.int32, (q_ref.shape[0], block_m), 1) + base
    int8_inputs = q_ref.dtype == jnp.int8
    bank_tile = bank_ref[...]
    if bank_tile.dtype == jnp.int8 and not int8_inputs:
        # ASYMMETRIC scoring (the defining property of ScaNN's score_ah,
        # reference search_scann.py:29-30): only the BANK is quantized —
        # bf16 queries hit dequantized-by-scale codes, so shortlist error
        # comes from bank rounding alone (~0.4% per component) instead
        # of bank+query rounding. One VPU cast per loaded tile, fused
        # ahead of the MXU matmul; the HBM saving (int8 bank reads) is
        # unchanged.
        bank_tile = bank_tile.astype(q_ref.dtype)
    s = jax.lax.dot_general(
        q_ref[...],
        bank_tile,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32 if int8_inputs else jnp.float32,
    )
    if int8_inputs:
        # Global-scale symmetric quantization: int32 scores are a positive
        # constant multiple of the approximate dot products, so ordering is
        # preserved; convert once for the f32 merge (|s| <= 127*127*D
        # stays well inside f32's exact-integer range for D <= 1024).
        s = s.astype(jnp.float32)
    if row_scale:
        # Per-row scales change the ordering (that is the point): one
        # VPU multiply fused onto the matmul epilogue, same cost class
        # as the l2 bias subtract.
        s = s * scale_ref[...]
    if l2:
        # Expanded-norm L2 (Faiss GpuIndexFlatL2 parity, reference
        # search_faiss.py:38-44): argmin ||q-b||² == argmax q·b - ||b||²/2,
        # with ||b||²/2 streamed in as a per-row bias. Same score
        # convention as ops/knn.exact_knn's l2 path.
        s = s - bias_ref[...]

    masked = jnp.where(col < valid_ref[0], s, NEG_INF)
    if merge_mode == "carry_lazy":
        # Skip the full-tile VMEM store for tiles that cannot contribute:
        # the masked scores stay a register/VMEM VALUE, only the row max
        # is reduced, and the store + merge run under one predicate.
        # Measured on v5e (1M bf16, warm compiles): 1533ms vs carry's
        # 1474ms — the store it avoids is cheap VMEM traffic while the
        # value-max pass is paid on EVERY tile, so 'carry' stays the
        # default. Kept because its semantics are identical and it
        # compiled fast when the remote Mosaic cache misbehaved (2-26s
        # vs 388-1283s observed for 'carry' in the same session).
        m0 = jnp.max(masked, axis=1, keepdims=True)

        @pl.when(jnp.any(m0 > jnp.min(vals_ref[...], axis=1, keepdims=True)))
        def _store_and_merge():
            s_ref[...] = masked
            _carry_merge(s_ref, vals_ref, idx_ref, base=base, k_pad=k_pad)

        @pl.when(j == n_bank_tiles - 1)
        def _store_lazy():
            vals_out_ref[...] = vals_ref[...]
            idx_out_ref[...] = idx_ref[...]

        return

    # NB: an attempted "mask only the boundary tile" split into two
    # predicated stores measured SLOWER (1950ms vs 1683ms/batch on v5e) —
    # the branch breaks the matmul/store fusion. Keep the single fused
    # masked store.
    s_ref[...] = masked

    def merge_chunk_loop(c0):
        """Insert candidates from s_ref[:, c0:c0+merge_chunk] into the
        running top-k until the chunk has nothing better. Working on a
        column CHUNK keeps each insertion pass at (Q, merge_chunk) instead
        of (Q, BLOCK_M) — after the first few bank tiles usually only one
        chunk of a contributing tile holds anything insertable."""
        csl = (slice(None), pl.ds(c0, merge_chunk))
        ccol = jax.lax.broadcasted_iota(
            jnp.int32, (q_ref.shape[0], merge_chunk), 1
        ) + (base + c0)
        big = jnp.int32(2**30)
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, vals_ref.shape, 1)

        def step():
            s_cur = s_ref[csl]
            run_min = jnp.min(vals_ref[...], axis=1, keepdims=True)  # (Q,1)
            cur_max = jnp.max(s_cur, axis=1, keepdims=True)  # (Q,1)
            better = cur_max > run_min  # (Q,1)

            # argmax of the chunk row (lowest column on ties)
            cand_col = jnp.min(
                jnp.where(s_cur >= cur_max, ccol, big), axis=1, keepdims=True
            )
            # argmin of the running top-k row
            min_slot = jnp.min(
                jnp.where(vals_ref[...] <= run_min, slot_ids, big),
                axis=1,
                keepdims=True,
            )
            # replace the min slot where the candidate is better
            do = better & (slot_ids == min_slot)
            vals_ref[...] = jnp.where(do, cur_max, vals_ref[...])
            idx_ref[...] = jnp.where(do, cand_col, idx_ref[...])
            # knock the extracted candidate out of the chunk (in place)
            s_ref[csl] = jnp.where((ccol == cand_col) & better, NEG_INF, s_cur)

        def cond(i):
            run_min = jnp.min(vals_ref[...], axis=1)
            cur_max = jnp.max(s_ref[csl], axis=1)
            return jnp.logical_and(i < k_pad, jnp.any(cur_max > run_min))

        def body(i):
            step()
            return i + 1

        jax.lax.while_loop(cond, body, jnp.int32(0))

    if merge_mode == "bucket":
        _bucket_merge_rounds(
            s_ref, vals_ref, idx_ref, cvals_ref, ccols_ref, ins_ref,
            base=base, nb=n_buckets, bucket_len=block_m // n_buckets,
            k_pad=k_pad,
        )
    elif merge_mode == "carry":
        _carry_merge(s_ref, vals_ref, idx_ref, base=base, k_pad=k_pad)
    elif merge_mode == "carry_nw":
        _carry_nw_merge(s_ref, vals_ref, idx_ref, base=base, k_pad=k_pad)
    elif merge_mode == "carry2":
        # carry variant extracting TWO candidates per tile read/write:
        # amortizes the expensive full-tile load + store over 2 insertions.
        col_l = jax.lax.broadcasted_iota(
            jnp.int32, (q_ref.shape[0], block_m), 1
        )
        big = jnp.int32(2**30)
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, vals_ref.shape, 1)
        m0 = jnp.max(s_ref[...], axis=1, keepdims=True)

        def insert(cur_max, cand_col):
            run_min = jnp.min(vals_ref[...], axis=1, keepdims=True)
            better = cur_max > run_min
            min_slot = jnp.min(
                jnp.where(vals_ref[...] <= run_min, slot_ids, big),
                axis=1, keepdims=True,
            )
            do = better & (slot_ids == min_slot)
            vals_ref[...] = jnp.where(do, cur_max, vals_ref[...])
            idx_ref[...] = jnp.where(do, cand_col + base, idx_ref[...])
            return better

        def cond(carry):
            i, cur_max = carry
            run_min = jnp.min(vals_ref[...], axis=1, keepdims=True)
            return jnp.logical_and(i < k_pad, jnp.any(cur_max > run_min))

        def body(carry):
            i, cur_max = carry
            s_cur = s_ref[...]  # one tile read per TWO extractions
            col1 = jnp.min(
                jnp.where(s_cur >= cur_max, col_l, big), axis=1, keepdims=True
            )
            b1 = insert(cur_max, col1)
            s_cur = jnp.where((col_l == col1) & b1, NEG_INF, s_cur)
            max2 = jnp.max(s_cur, axis=1, keepdims=True)
            col2 = jnp.min(
                jnp.where(s_cur >= max2, col_l, big), axis=1, keepdims=True
            )
            b2 = insert(max2, col2)
            s_cur = jnp.where((col_l == col2) & b2, NEG_INF, s_cur)
            s_ref[...] = s_cur  # one tile write
            new_max = jnp.max(s_cur, axis=1, keepdims=True)
            return i + 2, new_max

        @pl.when(jnp.any(m0 > jnp.min(vals_ref[...], axis=1, keepdims=True)))
        def _merge_carry2():
            jax.lax.while_loop(cond, body, (jnp.int32(0), m0))
    else:
        # Chunk-level predication: only chunks holding something better
        # than the current k-th best pay merge passes (rare after a few
        # tiles).
        run_min_all = jnp.min(vals_ref[...], axis=1)
        for c0 in range(0, block_m, merge_chunk):
            chunk_max = jnp.max(s_ref[:, pl.ds(c0, merge_chunk)], axis=1)

            @pl.when(jnp.any(chunk_max > run_min_all))
            def _(c0=c0):
                merge_chunk_loop(c0)

    @pl.when(j == n_bank_tiles - 1)
    def _store():
        vals_out_ref[...] = vals_ref[...]
        idx_out_ref[...] = idx_ref[...]


# Process-wide default merge mode. 'carry' is the fastest steady-state
# variant, but its remote Mosaic compile is a lottery (2s..1363s observed
# for the same program); when a compile blows the engine's budget
# (hbird_eval evaluate, HBIRD_COMPILE_BUDGET) the process flips this to
# 'carry_lazy' — identical semantics, reliably fast compiles, ~4% slower.
_DEFAULT_MERGE_MODE = ["carry"]


def default_merge_mode() -> str:
    return _DEFAULT_MERGE_MODE[0]


def set_default_merge_mode(mode: str) -> None:
    assert mode in (
        "single", "bucket", "carry", "carry2", "carry_lazy", "carry_nw"
    ), mode
    _DEFAULT_MERGE_MODE[0] = mode


def pallas_knn(
    queries: jax.Array,
    bank: jax.Array,
    k: int,
    *,
    valid_rows: Optional[jax.Array | int] = None,
    block_q: int = 256,
    block_m: int = 8192,
    merge_chunk: Optional[int] = None,
    sorted_results: bool = True,
    interpret: Optional[bool] = None,
    merge_mode: Optional[str] = None,
    n_buckets: int = 32,
    distance: str = "dot_product",
    row_scale: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k search, fused in one Pallas kernel.

    Args:
        queries: (Q, D) float32/bf16.
        bank: (M, D) same dtype family; scores accumulate in f32.
        k: neighbours per query (k <= 128 supported; padded internally).
        valid_rows: real bank rows (defaults to M); padded rows never win.
        block_q / block_m: tile sizes (Q padded to block_q, M to block_m).
        sorted_results: sort the k results by descending score (Faiss
            parity). Unsorted skips a final small top-k.
        merge_mode: top-k merge variant; None (default) resolves to the
            process default ('carry', or 'carry_lazy' after a
            compile-budget fallback — see set_default_merge_mode).
        distance: 'dot_product' (default) or 'l2'/'euclidean'
            (expanded-norm: score = q·b − ||b||²/2, ordering-equal to
            ascending squared L2 — Faiss GpuIndexFlatL2 parity). int8
            banks are dot_product-only.
        row_scale: optional (M,) or (M, 1) f32 per-bank-row dequant
            scales for int8 banks (SQ8 / per-row symmetric quantization):
            scores become (q_int · b_int) * row_scale[i], applied in the
            kernel epilogue so the top-k ORDERING is over dequantized
            dots. The caller multiplies the returned values by its query
            scale to recover approximate true dot products.

    Returns:
        (values, indices): (Q, k) f32 scores and int32 global row ids.
    """
    if merge_mode is None:
        # Resolved at trace time, outside the jit cache: a later flip of
        # the process default must produce a fresh trace, not hit a
        # cache entry keyed on merge_mode=None.
        merge_mode = _DEFAULT_MERGE_MODE[0]
    return _pallas_knn_jit(
        queries, bank, k,
        valid_rows=valid_rows, block_q=block_q, block_m=block_m,
        merge_chunk=merge_chunk, sorted_results=sorted_results,
        interpret=interpret, merge_mode=merge_mode, n_buckets=n_buckets,
        distance=distance, row_scale=row_scale,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "block_q", "block_m", "merge_chunk", "sorted_results",
        "interpret", "merge_mode", "n_buckets", "distance",
    ),
)
def _pallas_knn_jit(
    queries: jax.Array,
    bank: jax.Array,
    k: int,
    *,
    valid_rows: Optional[jax.Array | int] = None,
    block_q: int = 256,
    block_m: int = 8192,
    merge_chunk: Optional[int] = None,
    sorted_results: bool = True,
    interpret: Optional[bool] = None,
    merge_mode: str = "carry",
    n_buckets: int = 32,
    distance: str = "dot_product",
    row_scale: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    q_n, d = queries.shape
    m, d2 = bank.shape
    assert d == d2
    assert k <= 128, "k > 128 not supported by the fused kernel"
    assert distance in ("dot_product", "l2", "euclidean"), distance
    l2 = distance in ("l2", "euclidean")
    if l2:
        assert bank.dtype != jnp.int8, "l2 requires a float bank"
        assert row_scale is None, "row_scale is int8/dot_product-only"
    if row_scale is not None:
        assert bank.dtype == jnp.int8, "row_scale requires an int8 bank"
        row_scale = row_scale.reshape(-1)
        assert row_scale.shape[0] == m, (row_scale.shape, m)
    if interpret is None:
        # Mosaic only compiles on TPU; interpret transparently elsewhere
        # (CPU tests, multichip dry-runs on virtual devices).
        interpret = jax.default_backend() != "tpu"
    if valid_rows is None:
        valid_rows = m
    valid_rows = jnp.asarray(valid_rows, jnp.int32).reshape(1)

    k_pad = max(8, _round_up(k, 8))
    block_q = min(block_q, _round_up(q_n, 8))
    block_m = min(block_m, _round_up(m, 128))

    q_pad = _round_up(q_n, block_q)
    m_pad = _round_up(m, block_m)
    if q_pad != q_n:
        queries = jnp.pad(queries, ((0, q_pad - q_n), (0, 0)))
    if m_pad != m:
        bank = jnp.pad(bank, ((0, m_pad - m), (0, 0)))
        valid_rows = jnp.minimum(valid_rows, m)

    n_q_tiles = q_pad // block_q
    n_bank_tiles = m_pad // block_m

    extra_inputs = []
    extra_specs = []
    if l2:
        # One cheap f32 pass over the bank per call; under jit XLA fuses
        # it with the (padded) bank materialization. 4 B/row of extra HBM
        # stream per query tile vs D*2 B/row of bank reads (<0.3%).
        bank32 = bank.astype(jnp.float32)
        bias = (0.5 * jnp.sum(bank32 * bank32, axis=-1)).reshape(1, m_pad)
        extra_inputs.append(bias)
        extra_specs.append(
            pl.BlockSpec((1, block_m), lambda i, j, *_: (0, j))
        )
    if row_scale is not None:
        # Streamed like the l2 bias: (1, block_m) f32 per bank tile.
        # Padding scales are 0 (padded rows score 0 and are masked by
        # valid_rows anyway).
        if m_pad != m:
            row_scale = jnp.pad(row_scale, (0, m_pad - m))
        extra_inputs.append(
            row_scale.astype(jnp.float32).reshape(1, m_pad)
        )
        extra_specs.append(
            pl.BlockSpec((1, block_m), lambda i, j, *_: (0, j))
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_q_tiles, n_bank_tiles),
        in_specs=[
            pl.BlockSpec((block_q, d), lambda i, j, *_: (i, 0)),
            pl.BlockSpec((block_m, d), lambda i, j, *_: (j, 0)),
            *extra_specs,
        ],
        out_specs=[
            pl.BlockSpec((block_q, k_pad), lambda i, j, *_: (i, 0)),
            pl.BlockSpec((block_q, k_pad), lambda i, j, *_: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, k_pad), jnp.float32),
            pltpu.VMEM((block_q, k_pad), jnp.int32),
            pltpu.VMEM((block_q, block_m), jnp.float32),
            pltpu.VMEM((block_q, n_buckets), jnp.float32),
            pltpu.VMEM((block_q, n_buckets), jnp.int32),
            pltpu.VMEM((block_q, n_buckets), jnp.int32),
        ],
    )
    # Measured on v5e (1M bank): sub-tile merge chunks are SLOWER than one
    # full-width merge (52k q/s at block_m vs 29k at block_m/8 — the extra
    # predicated regions cost more than the narrower passes save), so the
    # default is a single chunk; the knob remains for other shapes.
    # The bucket/tournament merge (merge_mode='bucket') was also measured
    # SLOWER at every config tried (scripts/bench_merge_modes.py: 13.7k
    # q/s at nb=32 vs 51.9k single; nb=64/128 and bm=16384 worse still) —
    # the static per-bucket slice loops defeat Mosaic's full-width
    # vectorization even though rounds are rare. Kept for exotic shapes.
    # 'carry2' (two extractions per tile read/write) also measured slower
    # (52.3k vs 57-60k carry): the tile value stays in VMEM either way, so
    # the amortized load/store never materializes while the extra max/where
    # passes do. 'carry' at block_q=256 remains the production default.
    merge_chunk = min(merge_chunk or block_m, block_m)
    assert block_m % merge_chunk == 0, (block_m, merge_chunk)
    assert merge_mode in (
        "single", "bucket", "carry", "carry2", "carry_lazy", "carry_nw"
    ), merge_mode
    if merge_mode == "bucket":
        n_buckets = min(n_buckets, block_m)
        assert block_m % n_buckets == 0, (block_m, n_buckets)
    kernel = functools.partial(
        _knn_kernel,
        k_pad=k_pad,
        block_m=block_m,
        n_bank_tiles=n_bank_tiles,
        merge_chunk=merge_chunk,
        merge_mode=merge_mode,
        n_buckets=n_buckets,
        l2=l2,
        row_scale=row_scale is not None,
    )
    itemsize = jnp.dtype(queries.dtype).itemsize
    vmem_bytes = (
        2 * (block_q + block_m) * d * itemsize  # double-buffered input tiles
        + 2 * block_q * block_m * 4  # scores scratch + headroom for temps
        + 4 * block_q * k_pad * 8
    )
    vals, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, k_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=min(int(vmem_bytes * 1.5), 100 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * q_pad * m_pad * d,
            bytes_accessed=q_pad * d * 4 + m_pad * d * 4 + q_pad * k_pad * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(valid_rows, queries, bank, *extra_inputs)

    vals = vals[:q_n]
    idx = idx[:q_n]
    if sorted_results or k != k_pad:
        # The scratch holds the top-k_pad as an unsorted set; selecting k of
        # them needs a final (tiny) top-k even for unsorted output.
        svals, sel = jax.lax.top_k(vals, k)
        sidx = jnp.take_along_axis(idx, sel, axis=-1)
        return svals, sidx
    return vals, idx
