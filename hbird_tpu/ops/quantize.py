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


def quantize_queries_int8(q: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Quantize a query batch with one shared (traced) scale.

    Returns ``(q_int8, q_scale)``; jit-traceable — the engine calls this
    inside the fused eval step.
    """
    q32 = q.astype(jnp.float32)
    q_scale = jnp.maximum(jnp.abs(q32).max(), 1e-12) / 127.0
    q_cast = jnp.clip(jnp.round(q32 / q_scale), -127, 127).astype(jnp.int8)
    return q_cast, q_scale
