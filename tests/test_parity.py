"""Golden parity tests vs torch re-implementations of the reference math.

These pin the evaluation path's numerics against independent torch oracles
(the reference is torch): bilinear upsampling convention, and the complete
retrieval -> cross-attention -> upsample -> argmax -> Hungarian-mIoU chain
given identical memory contents (the parity definition from SURVEY §7 —
bit-for-bit given the same bank, since RNG-dependent memory construction
can only match statistically)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as tF  # noqa: E402

from hbird_tpu.core.attention import cross_attention_from_scores  # noqa: E402
from hbird_tpu.ops.knn import exact_knn  # noqa: E402
from hbird_tpu.utils.eval_metrics import PredsmIoU  # noqa: E402


class TestUpsampleParity:
    @pytest.mark.parametrize("shape", [(8, 8, 32, 32), (14, 14, 224, 224), (5, 7, 33, 61)])
    def test_bilinear_matches_torch_interpolate(self, shape):
        sh, sw, oh, ow = shape
        rng = np.random.default_rng(sum(shape))
        x = rng.normal(size=(2, 3, sh, sw)).astype(np.float32)
        ours = np.asarray(
            jax.image.resize(
                jnp.asarray(x), (2, 3, oh, ow), method="bilinear", antialias=False
            )
        )
        ref = tF.interpolate(
            torch.from_numpy(x), size=(oh, ow), mode="bilinear"
        ).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_argmax_after_upsample_identical(self):
        # The actual decision variable of the pipeline.
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 21, 14, 14)).astype(np.float32)
        ours = np.asarray(
            jnp.argmax(
                jax.image.resize(
                    jnp.asarray(x), (2, 21, 224, 224), "bilinear", antialias=False
                ),
                axis=1,
            )
        )
        ref = tF.interpolate(torch.from_numpy(x), size=(224, 224), mode="bilinear")
        ref = ref.argmax(dim=1).numpy()
        assert (ours == ref).mean() > 0.999  # ties at fp noise may differ


def _torch_reference_eval(feats, memory, labels_mem, k, beta, s, hw, gt, num_classes,
                          ignore_index):
    """Reference evaluation semantics in torch (hbird_eval.py:184-265,
    575-637): un-normalized queries, dot-product retrieval over the
    normalized bank, cosine cross-attention, bilinear upsample, argmax,
    Hungarian mIoU."""
    q = torch.from_numpy(feats)  # (B, N, D)
    mem = torch.from_numpy(memory)
    lab = torch.from_numpy(labels_mem)
    b, n, d = q.shape
    scores = q.reshape(-1, d) @ mem.T
    _, idx = torch.topk(scores, k, dim=-1)
    key_f = mem[idx]  # (Q, k, D)
    key_l = lab[idx]  # (Q, k, C)

    qn = tF.normalize(q.reshape(-1, d), dim=-1)
    kn = tF.normalize(key_f, dim=-1)
    attn = torch.softmax((qn[:, None, :] * kn).sum(-1) / beta, dim=-1)
    label_hat = (attn[..., None] * key_l).sum(1)  # (Q, C)
    lh = label_hat.reshape(b, s, s, num_classes).permute(0, 3, 1, 2)
    up = tF.interpolate(lh, size=hw, mode="bilinear")
    pred = up.argmax(1).numpy()

    metric = PredsmIoU(num_classes, num_classes, ignore_index=ignore_index)
    metric.update(gt, pred)
    return pred, metric.compute(is_global_zero=True)[0]


class TestFullEvalPathParity:
    def test_matches_torch_reference_given_same_memory(self):
        rng = np.random.default_rng(1)
        B, S, PS, D, C, K = 3, 8, 4, 16, 7, 5
        HW = (S * PS, S * PS)
        M = 500
        memory = rng.normal(size=(M, D)).astype(np.float32)
        memory /= np.linalg.norm(memory, axis=1, keepdims=True)
        labels_mem = rng.dirichlet(np.ones(C), size=M).astype(np.float32)
        feats = rng.normal(size=(B, S * S, D)).astype(np.float32)
        gt = rng.integers(0, C, size=(B, *HW))
        gt[0, :2, :2] = 255  # some ignored pixels

        # torch reference path
        ref_pred, ref_miou = _torch_reference_eval(
            feats, memory, labels_mem, K, 0.02, S, HW, gt, C, 255
        )

        # our fused path
        q = jnp.asarray(feats.reshape(-1, D))
        vals, idx = exact_knn(q, jnp.asarray(memory), K, bank_block=128)
        lbls = jnp.asarray(labels_mem)[idx]
        label_hat = cross_attention_from_scores(
            vals.reshape(B, -1, K),
            jnp.linalg.norm(q, axis=-1).reshape(B, -1),
            lbls.reshape(B, -1, K, C),
        )
        lh = label_hat.reshape(B, S, S, C).transpose(0, 3, 1, 2)
        up = jax.image.resize(lh, (B, C, *HW), "bilinear", antialias=False)
        pred = np.asarray(jnp.argmax(up, axis=1))

        agree = (pred == ref_pred).mean()
        assert agree > 0.999, agree

        metric = PredsmIoU(C, C, ignore_index=255)
        metric.update(gt, pred)
        miou = metric.compute(is_global_zero=True)[0]
        assert miou == pytest.approx(ref_miou, abs=1e-4)

    def test_neighbor_sets_match_torch_topk(self):
        rng = np.random.default_rng(2)
        M, D, K = 1000, 32, 30
        memory = rng.normal(size=(M, D)).astype(np.float32)
        memory /= np.linalg.norm(memory, axis=1, keepdims=True)
        q = rng.normal(size=(64, D)).astype(np.float32)
        _, idx = exact_knn(jnp.asarray(q), jnp.asarray(memory), K, bank_block=256)
        _, ref_idx = torch.topk(torch.from_numpy(q) @ torch.from_numpy(memory).T, K)
        # Same neighbour SETS (tie order may differ between libs).
        for r in range(64):
            assert set(np.asarray(idx)[r].tolist()) == set(ref_idx[r].tolist())
