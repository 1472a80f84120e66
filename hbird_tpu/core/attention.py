"""Cosine-similarity cross-attention for soft-label transfer.

Semantics match reference hbird/hbird_eval.py:575-609 (`_cross_attention`,
beta=0.02): normalize q and k, scaled dot-product over the k retrieved
neighbours, softmax, weighted sum of neighbour soft labels.

TPU-first optimization: memory-bank rows are L2-normalized when stored
(reference hbird/hbird_eval.py:324, 335-337), so the cosine similarity
cos(q, k_i) equals (retrieval dot-product score) / ||q||. The sharded kNN
therefore only needs to return scores + gathered labels — neighbour
feature vectors never leave their bank shard. `cross_attention_from_scores`
implements that fused path; `cross_attention` is the literal formulation
(used for parity tests and `return_knn_details`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_BETA = 0.02
_NORM_EPS = 1e-12  # F.normalize default eps (denominator = max(norm, eps))


def _l2_normalize(x: jax.Array, axis: int = -1) -> jax.Array:
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, _NORM_EPS)


def cross_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    beta: float = DEFAULT_BETA,
) -> jax.Array:
    """Literal cross-attention label aggregation.

    Args:
        q: (B, N, D) query patch features (not necessarily normalized).
        k: (B, N, K, D) retrieved neighbour features.
        v: (B, N, K, C) retrieved neighbour soft labels.
        beta: softmax temperature.

    Returns:
        (B, N, C) aggregated soft labels.
    """
    qn = _l2_normalize(q)
    kn = _l2_normalize(k)
    sims = jnp.einsum("bnd,bnkd->bnk", qn, kn, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(sims / beta, axis=-1)
    return jnp.einsum("bnk,bnkc->bnc", attn, v, preferred_element_type=jnp.float32)


def cross_attention_from_scores(
    scores: jax.Array,
    q_norm: jax.Array,
    v: jax.Array,
    beta: float = DEFAULT_BETA,
) -> jax.Array:
    """Fused path: neighbours' dot-product scores stand in for cosine sims.

    Valid because bank rows are unit-norm: cos(q, k) = (q·k) / ||q||.

    Args:
        scores: (B, N, K) retrieval dot-product scores q·k (bank rows unit-norm).
        q_norm: (B, N) L2 norms of the query features.
        v: (B, N, K, C) retrieved neighbour soft labels.
        beta: softmax temperature.

    Returns:
        (B, N, C) aggregated soft labels.
    """
    denom = jnp.maximum(q_norm, _NORM_EPS)[..., None] * beta
    attn = jax.nn.softmax(scores / denom, axis=-1)
    return jnp.einsum("bnk,bnkc->bnc", attn, v, preferred_element_type=jnp.float32)
