"""Symmetric int8 quantization shared by every bank storage path.

One recipe — global abs-max scale (``use_int8``) or per-row abs-max
scales (``quantization='int8_rows'``, the Faiss SQ8 analogue / the cheap
core of ScaNN's ``score_ah``, reference hbird/nn/search_scann.py:29-30)
— consumed by the exact backend, the flat approximate scan, and both IVF
tree builds. Keeping it here, next to the kernels that dequantize the
scales in their epilogues, keeps the contract in one place (the flat
path once lost the pre-quantized-injection guard to a drifted copy).
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp

Scale = Union[jax.Array, jnp.float32]


def quantize_bank_int8(
    bank_f: jax.Array, *, per_row: bool
) -> Tuple[jax.Array, jax.Array]:
    """Quantize a float bank to symmetric int8 codes.

    Returns ``(codes, scale)`` where ``codes`` is int8 and ``scale`` is
    a ``(M, 1)`` float32 array when ``per_row`` (2-D so ``state_spec``
    scales it with the row count) else a scalar float32. Dequantization
    is ``codes * scale``; with dot-product scoring the kernel multiplies
    int32 scores by the row scale (and the caller by the query scale) so
    top-k ordering is over dequantized dot products.
    """
    if per_row:
        scale = (
            jnp.maximum(jnp.abs(bank_f).max(axis=1, keepdims=True), 1e-12)
            / 127.0
        ).astype(jnp.float32)
    else:
        scale = jnp.maximum(jnp.abs(bank_f).max(), 1e-12) / 127.0
    codes = jnp.clip(jnp.round(bank_f / scale), -127, 127).astype(jnp.int8)
    return codes, scale


def block_column_scales(
    bank_f: jax.Array, dims_per_block: int
) -> jax.Array:
    """Per-column relative scales ``c`` of shape ``(d,)``, constant
    within each block of ``dims_per_block`` feature dims.

    ScaNN's ``dimensions_per_block`` groups dims into quantization
    blocks (reference hbird/nn/search_scann.py:30); here each block
    gets a scale proportional to its column abs-max so blocks with
    small dynamic range keep full int8 resolution instead of being
    crushed by the row's largest dim. Normalized so the largest block
    has scale 1 — the per-row scale keeps its abs-max/127 meaning.
    Dequantization stays separable (``codes * s_row[i] * c[j]``), which
    the search path exploits: queries are pre-scaled by ``c`` once, the
    kernels are untouched.
    """
    d = bank_f.shape[1]
    dpb = int(dims_per_block)
    if dpb < 1:
        raise ValueError(f"dims_per_block must be >= 1: {dims_per_block}")
    col_max = jnp.abs(bank_f.astype(jnp.float32)).max(axis=0)
    nb = -(-d // dpb)
    pad = nb * dpb - d
    if pad:
        col_max = jnp.pad(col_max, (0, pad))
    blk = col_max.reshape(nb, dpb).max(axis=1)
    blk = blk / jnp.maximum(blk.max(), 1e-12)
    # Floor keeps all-zero blocks harmless (0/c stays 0; scores unmoved).
    blk = jnp.maximum(blk, 1e-4)
    return jnp.repeat(blk, dpb)[:d].astype(jnp.float32)


def _aniso_eta(d: int, threshold: float) -> float:
    """ScaNN's parallel-residual weight at threshold ``T``:
    ``eta = (d-1) T^2 / (1 - T^2)`` (the score-aware loss says residual
    parallel to the row biases dot scores of exactly the neighbors whose
    dot exceeds ``T * |x|``, so it is weighted eta-to-1 over the
    orthogonal part)."""
    t2 = min(max(float(threshold) ** 2, 0.0), 0.99)
    return (d - 1) * t2 / max(1.0 - t2, 1e-6)


def _aniso_loss(x, deq, norm2, eta):
    r = deq - x
    par_coef = (r * x).sum(axis=1, keepdims=True) / norm2
    par2 = par_coef * par_coef * norm2
    return eta * par2 + ((r * r).sum(axis=1, keepdims=True) - par2)


def quantize_codes_aniso(
    bank_f: jax.Array,
    scale: jax.Array,
    threshold: float,
    *,
    col_scale: jax.Array = None,
    iters: int = 4,
) -> jax.Array:
    """int8 codes minimizing the ANISOTROPIC quantization loss (the
    score-aware objective behind ScaNN's ``score_ah``
    ``anisotropic_quantization_threshold``; reference
    hbird/nn/search_scann.py:29) instead of round-to-nearest.

    The residual ``r = dequant(codes) - x`` splits into the component
    parallel to ``x`` (which biases dot-product scores of the row's own
    near-neighbors) and the orthogonal rest; the loss weights the
    parallel part by ``eta = (d-1) T^2 / (1 - T^2)``. Round-to-nearest
    minimizes per-dim error with no regard for residual DIRECTION; this
    refinement iteratively re-rounds a target shifted against the
    measured parallel residual (trading a little orthogonal error for an
    eta-weighted parallel reduction), then keeps — per row — whichever
    codes score the lower loss, so the result is never worse than
    round-to-nearest. Note a maxabs-scale LADDER is provably inert here:
    clipping the row max costs (1-f)^2 max^2 parallel-ish error against
    a d (1-f^2) s^2/12 rounding gain, which for int8 needs d >> 10^5 to
    pay — so the codes, not the scale, are the free variable.
    """
    x = bank_f.astype(jnp.float32)
    denom = scale * col_scale if col_scale is not None else scale
    d = x.shape[1]
    eta = jnp.float32(_aniso_eta(d, threshold))
    norm2 = jnp.maximum((x * x).sum(axis=1, keepdims=True), 1e-12)

    def codes_of(y):
        return jnp.clip(jnp.round(y / denom), -127, 127)

    def deq_of(codes):
        return codes * denom

    best = codes_of(x)
    best_loss = _aniso_loss(x, deq_of(best), norm2, eta)
    # Damped target shifting: quantize y, measure the TRUE residual's
    # parallel coefficient, shift y against it, re-quantize. eta >> 1
    # drives the shift toward fully cancelling the parallel bias.
    damp = jnp.float32(1.0) - jnp.float32(1.0) / (1.0 + eta)
    y = x
    for _ in range(max(1, int(iters))):
        codes = codes_of(y)
        r = deq_of(codes) - x
        par_coef = (r * x).sum(axis=1, keepdims=True) / norm2
        y = y - damp * par_coef * x
        loss = _aniso_loss(x, deq_of(codes), norm2, eta)
        best = jnp.where(loss < best_loss, codes, best)
        best_loss = jnp.minimum(loss, best_loss)
    codes = codes_of(y)
    loss = _aniso_loss(x, deq_of(codes), norm2, eta)
    best = jnp.where(loss < best_loss, codes, best)
    return best.astype(jnp.int8)


def quantize_bank_int8_ah(
    bank_f: jax.Array,
    *,
    dims_per_block: int = None,
    aniso_threshold: float = None,
    row_block: int = 262144,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """``score_ah``-flavored scalar quantization: separable per-row ×
    per-column-block scales plus anisotropic CODE refinement.

    Returns ``(codes, row_scale (M,1), col_scale (d,) or None)``.
    Dequantization is ``codes * row_scale * col_scale`` — exactly
    recoverable at search time by pre-scaling queries with ``col_scale``
    and keeping the kernels' per-row epilogue, so the asymmetric int8
    paths pick these up with zero kernel changes.

    ``row_block``: the anisotropic refinement materializes a handful of
    (block, d) f32 temps per iteration; chunking rows bounds them at
    ~800 MB for d=768. Pass ``None`` to disable chunking (sharded banks,
    where slicing would gather across shards and each shard only holds
    M/p rows anyway).
    """
    col = (
        block_column_scales(bank_f, dims_per_block)
        if dims_per_block is not None
        else None
    )
    xc = (
        bank_f.astype(jnp.float32) / col
        if col is not None
        else bank_f.astype(jnp.float32)
    )
    scale = (
        jnp.maximum(jnp.abs(xc).max(axis=1, keepdims=True), 1e-12) / 127.0
    ).astype(jnp.float32)
    if aniso_threshold is not None:
        m = bank_f.shape[0]
        if row_block is None or m <= row_block:
            codes = quantize_codes_aniso(
                bank_f, scale, aniso_threshold, col_scale=col
            )
        else:
            codes = jnp.concatenate(
                [
                    quantize_codes_aniso(
                        bank_f[s : min(s + row_block, m)],
                        scale[s : min(s + row_block, m)],
                        aniso_threshold,
                        col_scale=col,
                    )
                    for s in range(0, m, row_block)
                ],
                axis=0,
            )
    else:
        codes = jnp.clip(jnp.round(xc / scale), -127, 127).astype(jnp.int8)
    return codes, scale, col


def quantize_queries_int8(q: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Quantize a query batch with one shared (traced) scale.

    Returns ``(q_int8, q_scale)``; jit-traceable — the engine calls this
    inside the fused eval step.
    """
    q32 = q.astype(jnp.float32)
    q_scale = jnp.maximum(jnp.abs(q32).max(), 1e-12) / 127.0
    q_cast = jnp.clip(jnp.round(q32 / q_scale), -127, 127).astype(jnp.int8)
    return q_cast, q_scale
