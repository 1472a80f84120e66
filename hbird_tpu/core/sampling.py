"""Bounded-memory patch sampling.

When a memory-bank size cap is set, a fixed number K of patches is sampled
per training image, preferring patches whose classes are *rare* within the
image. Semantics match the reference (hbird/hbird_eval.py:447-517,
`_sample_features`), fully vectorized and jittable:

1. presence[b, p, c]   — does class c appear anywhere in patch p of image b
2. class_freq[b, c]    — number of patches of image b containing class c
3. score[b, p]         — sum of class_freq over classes present in patch p
                         (rare classes => low score)
4. empty patches get a 1e6 sentinel; non-empty scores are multiplied by
   U(0,1) noise (order-preserving randomized tie-break)
5. the K *smallest* scores per image are selected.

RNG note: the reference draws torch CPU uniforms; we use the JAX PRNG.
Bit-identical sampling is impossible across RNGs — parity is statistical
(see reference hbird/hbird_eval.py:495-508).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

EMPTY_PATCH_SENTINEL = 1e6  # reference hbird/hbird_eval.py:493


def patch_sampling_scores(
    patchified_gt: jax.Array, num_classes: int
) -> Tuple[jax.Array, jax.Array]:
    """Per-patch class-rarity scores and non-empty mask.

    Args:
        patchified_gt: (B, S, S, P) int class ids in [0, num_classes).
        num_classes: C.

    Returns:
        scores: (B, S*S) float32 — sum of per-image class frequencies over
            the classes present in each patch.
        nonzero_mask: (B, S*S) bool — patch contains at least one class id
            (always True when ids are valid; kept for reference parity).
    """
    b, s1, s2, p = patchified_gt.shape
    gt = patchified_gt.reshape(b, s1 * s2, p)
    classes = jnp.arange(num_classes, dtype=gt.dtype)
    # (B, SS, P, C) broadcast-compare fused by XLA into the any-reduce.
    presence = jnp.any(gt[..., None] == classes, axis=2)  # (B, SS, C)
    presence_f = presence.astype(jnp.float32)
    class_freq = presence_f.sum(axis=1)  # (B, C)
    scores = jnp.einsum(
        "bpc,bc->bp", presence_f, class_freq, preferred_element_type=jnp.float32
    )
    nonzero_mask = jnp.any(presence, axis=-1)
    return scores, nonzero_mask


def sample_patches(
    key: jax.Array,
    features: jax.Array,
    patchified_gt: jax.Array,
    num_classes: int,
    num_samples: int,
) -> Tuple[jax.Array, jax.Array]:
    """Sample `num_samples` patch indices per image by perturbed rarity score.

    Args:
        key: PRNG key.
        features: (B, S*S, D) patch features.
        patchified_gt: (B, S, S, P) int class ids.
        num_classes: C.
        num_samples: K patches to keep per image.

    Returns:
        sampled_features: (B, K, D)
        sampled_indices: (B, K) int32 patch indices into the S*S grid.
    """
    scores, nonzero = patch_sampling_scores(patchified_gt, num_classes)
    noise = jax.random.uniform(key, scores.shape, dtype=scores.dtype)
    perturbed = jnp.where(nonzero, scores * noise, EMPTY_PATCH_SENTINEL)
    # K smallest == top-K of the negated scores.
    _, idx = jax.lax.top_k(-perturbed, num_samples)  # (B, K)
    sampled = jnp.take_along_axis(features, idx[..., None], axis=1)
    return sampled, idx.astype(jnp.int32)
