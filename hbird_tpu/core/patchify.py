"""Ground-truth patchification and per-patch soft labels.

Pure jittable functions. Semantics match the reference implementation:
- patchify: reference hbird/hbird_eval.py:554-573 (`_patchify_gt`)
- soft labels = per-patch pixel class frequency:
  reference hbird/hbird_eval.py:319-320 (one_hot(...).mean(dim=3))

Design note (TPU): the one-hot + mean is written as a broadcast-compare
fused into a reduction; XLA fuses the (..., P, C) intermediate into the
reduce so it is never materialized in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def patchify_gt(gt: jax.Array, patch_size: int) -> jax.Array:
    """Rearrange a dense label map into per-patch pixel vectors.

    Args:
        gt: (B, C, H, W) integer class ids.
        patch_size: spatial patch size p.

    Returns:
        (B, H//p, W//p, C*p*p) integer class ids, pixels of each patch
        flattened in (channel, row, col) order — identical layout to the
        reference reshape/permute (hbird/hbird_eval.py:569-573).
    """
    b, c, h, w = gt.shape
    sh, sw = h // patch_size, w // patch_size
    x = gt.reshape(b, c, sh, patch_size, sw, patch_size)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b, sh, sw, c * patch_size * patch_size)


def patch_soft_labels(patchified_gt: jax.Array, num_classes: int) -> jax.Array:
    """Per-patch soft label distribution = pixel class frequency.

    Args:
        patchified_gt: (B, S, S, P) integer class ids in [0, num_classes).
        num_classes: number of classes C.

    Returns:
        (B, S, S, C) float32, rows summing to 1.
    """
    one_hot = jax.nn.one_hot(patchified_gt, num_classes, dtype=jnp.float32)
    return one_hot.mean(axis=3)
