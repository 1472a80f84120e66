"""Unit tests for the pure core math: patchify, soft labels, cross-attention,
sampling scores. Golden values are hand-computed or checked against naive
numpy re-implementations of the documented reference semantics
(reference hbird/hbird_eval.py:447-609)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hbird_tpu.core import (
    cross_attention,
    cross_attention_from_scores,
    patch_sampling_scores,
    patch_soft_labels,
    patchify_gt,
    sample_patches,
)


class TestPatchify:
    def test_layout_matches_reshape_permute(self):
        rng = np.random.default_rng(0)
        gt = rng.integers(0, 21, size=(2, 1, 8, 12)).astype(np.int32)
        out = np.asarray(patchify_gt(jnp.asarray(gt), 4))
        assert out.shape == (2, 2, 3, 16)
        # Patch (b, i, j) must contain exactly the pixels of the 4x4 tile.
        for b in range(2):
            for i in range(2):
                for j in range(3):
                    tile = gt[b, 0, i * 4 : (i + 1) * 4, j * 4 : (j + 1) * 4]
                    np.testing.assert_array_equal(out[b, i, j], tile.reshape(-1))

    def test_multichannel_order(self):
        # Channel-major flattening (c, p, p) like the reference permute.
        gt = np.arange(2 * 2 * 2).reshape(1, 2, 2, 2).astype(np.int32)
        out = np.asarray(patchify_gt(jnp.asarray(gt), 2))
        assert out.shape == (1, 1, 1, 8)
        np.testing.assert_array_equal(out[0, 0, 0], gt.reshape(-1))


class TestSoftLabels:
    def test_pixel_frequency(self):
        gt = jnp.asarray([[[[0, 0, 1, 2]]]], dtype=jnp.int32)  # (1,1,1,4)
        label = np.asarray(patch_soft_labels(gt, 4))
        np.testing.assert_allclose(label[0, 0, 0], [0.5, 0.25, 0.25, 0.0])

    def test_rows_sum_to_one(self):
        rng = np.random.default_rng(1)
        gt = jnp.asarray(rng.integers(0, 5, size=(2, 3, 3, 16)), dtype=jnp.int32)
        label = np.asarray(patch_soft_labels(gt, 5))
        np.testing.assert_allclose(label.sum(-1), np.ones((2, 3, 3)), rtol=1e-6)


class TestCrossAttention:
    def test_one_hot_neighbour_dominates(self):
        # With beta=0.02 a much-closer neighbour should get ~all the weight.
        q = jnp.asarray([[[1.0, 0.0]]])  # (1,1,2)
        k = jnp.asarray([[[[1.0, 0.0], [0.0, 1.0]]]])  # (1,1,2,2)
        v = jnp.asarray([[[[1.0, 0.0], [0.0, 1.0]]]])  # labels
        out = np.asarray(cross_attention(q, k, v))
        assert out[0, 0, 0] > 0.999

    def test_matches_naive_numpy(self):
        rng = np.random.default_rng(2)
        B, N, K, D, C = 2, 5, 4, 8, 3
        q = rng.normal(size=(B, N, D)).astype(np.float32)
        k = rng.normal(size=(B, N, K, D)).astype(np.float32)
        v = rng.uniform(size=(B, N, K, C)).astype(np.float32)
        out = np.asarray(cross_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))

        qn = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        kn = k / np.maximum(np.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        sims = np.einsum("bnd,bnkd->bnk", qn, kn) / 0.02
        e = np.exp(sims - sims.max(-1, keepdims=True))
        attn = e / e.sum(-1, keepdims=True)
        ref = np.einsum("bnk,bnkc->bnc", attn, v)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def test_from_scores_equals_full(self):
        # When neighbours are unit-norm, the score-based fused path must
        # match the literal path.
        rng = np.random.default_rng(3)
        B, N, K, D, C = 2, 4, 6, 16, 5
        q = rng.normal(size=(B, N, D)).astype(np.float32)
        k = rng.normal(size=(B, N, K, D)).astype(np.float32)
        k = k / np.linalg.norm(k, axis=-1, keepdims=True)
        v = rng.uniform(size=(B, N, K, C)).astype(np.float32)

        full = np.asarray(cross_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
        scores = np.einsum("bnd,bnkd->bnk", q, k)
        qnorm = np.linalg.norm(q, axis=-1)
        fused = np.asarray(
            cross_attention_from_scores(
                jnp.asarray(scores), jnp.asarray(qnorm), jnp.asarray(v)
            )
        )
        np.testing.assert_allclose(fused, full, rtol=1e-4, atol=1e-5)


class TestSampling:
    def test_scores_prefer_rare_classes(self):
        # Image with 4 patches of 1 pixel each: classes [0, 0, 0, 7].
        # class 0 appears in 3 patches, class 7 in 1 -> patch 3 scores lowest.
        gt = jnp.asarray([[[[0], [0]], [[0], [7]]]], dtype=jnp.int32)  # (1,2,2,1)
        scores, nonzero = patch_sampling_scores(gt, 8)
        scores = np.asarray(scores)[0]
        assert np.asarray(nonzero).all()
        np.testing.assert_allclose(scores, [3.0, 3.0, 3.0, 1.0])

    def test_score_matches_naive(self):
        rng = np.random.default_rng(4)
        B, S, P, C = 3, 4, 9, 6
        gt = rng.integers(0, C, size=(B, S, S, P)).astype(np.int32)
        scores = np.asarray(patch_sampling_scores(jnp.asarray(gt), C)[0])
        for b in range(B):
            flat = gt[b].reshape(S * S, P)
            presence = np.zeros((S * S, C), bool)
            for p in range(S * S):
                presence[p, np.unique(flat[p])] = True
            freq = presence.sum(0).astype(np.float64)
            expected = presence @ freq
            np.testing.assert_allclose(scores[b], expected)

    def test_sample_patches_selects_rarest(self):
        # Deterministic check: noise in (0,1) cannot reorder a patch whose
        # score is far below all others.
        gt = np.zeros((1, 2, 2, 4), np.int32)
        gt[0, 1, 1, :] = 5  # unique class in patch index 3
        feats = jnp.asarray(np.arange(4 * 3, dtype=np.float32).reshape(1, 4, 3))
        sampled, idx = sample_patches(
            jax.random.PRNGKey(0), feats, jnp.asarray(gt), 6, num_samples=1
        )
        assert int(idx[0, 0]) == 3
        np.testing.assert_array_equal(np.asarray(sampled[0, 0]), np.asarray(feats[0, 3]))
