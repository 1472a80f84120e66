"""Tests for the streaming PredsmIoU metric and Hungarian solver."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment as scipy_lsa

from hbird_tpu.utils.eval_metrics import PredsmIoU, confusion_matrix
from hbird_tpu.utils.hungarian import hungarian


class TestHungarian:
    @pytest.mark.parametrize("shape", [(3, 3), (5, 8), (8, 5), (1, 4), (151, 151)])
    def test_matches_scipy_cost(self, shape):
        rng = np.random.default_rng(sum(shape))
        cost = rng.uniform(size=shape)
        r1, c1 = hungarian(cost)
        r2, c2 = scipy_lsa(cost)
        assert np.isclose(cost[r1, c1].sum(), cost[r2, c2].sum())


class TestConfusionMatrix:
    def test_simple_counts(self):
        gt = np.array([0, 0, 1, 1, 2])
        pred = np.array([0, 1, 1, 1, 0])
        conf = np.asarray(confusion_matrix(gt, pred, 3, 3))
        expected = np.array([[1, 1, 0], [0, 2, 0], [1, 0, 0]])
        np.testing.assert_array_equal(conf, expected)

    def test_ignore_index(self):
        gt = np.array([0, 255, 1])
        pred = np.array([0, 0, 1])
        conf = np.asarray(confusion_matrix(gt, pred, 2, 2, ignore_index=255))
        np.testing.assert_array_equal(conf, np.eye(2, dtype=np.int64))

    def test_out_of_range_dropped(self):
        gt = np.array([0, 5, -1, 1])
        pred = np.array([0, 0, 0, 9])
        conf = np.asarray(confusion_matrix(gt, pred, 2, 2))
        np.testing.assert_array_equal(conf, np.array([[1, 0], [0, 0]]))

    def test_large_streamed_matches_numpy(self):
        rng = np.random.default_rng(0)
        n = 3_000_000  # spans multiple on-device chunks
        gt = rng.integers(0, 21, size=n)
        pred = rng.integers(0, 21, size=n)
        conf = np.asarray(confusion_matrix(gt, pred, 21, 21))
        ref = np.zeros((21, 21), np.int64)
        np.add.at(ref, (gt, pred), 1)
        np.testing.assert_array_equal(conf, ref)


class TestPredsmIoU:
    def test_perfect_prediction_hungarian(self):
        rng = np.random.default_rng(1)
        gt = rng.integers(0, 5, size=(4, 32, 32))
        metric = PredsmIoU(5, 5)
        metric.update(gt, gt)
        miou, tp, fp, fn, reordered, bg = metric.compute(is_global_zero=True)
        assert miou == pytest.approx(1.0)
        assert sum(fp) == 0 and sum(fn) == 0

    def test_permuted_prediction_recovered(self):
        # Hungarian matching must undo a label permutation.
        rng = np.random.default_rng(2)
        gt = rng.integers(0, 5, size=(2, 64, 64))
        perm = np.array([3, 4, 0, 2, 1])
        pred = perm[gt]
        metric = PredsmIoU(5, 5)
        metric.update(gt, pred)
        miou, *_ = metric.compute(is_global_zero=True)
        assert miou == pytest.approx(1.0)

    def test_ignore_index_excluded(self):
        gt = np.array([[0, 1, 255, 255]])
        pred = np.array([[0, 1, 0, 1]])
        metric = PredsmIoU(2, 2, ignore_index=255)
        metric.update(gt, pred)
        miou, *_ = metric.compute(is_global_zero=True)
        assert miou == pytest.approx(1.0)

    def test_many_to_one(self):
        # Two pred clusters both mapping onto one gt class.
        gt = np.array([0, 0, 0, 0, 1, 1])
        pred = np.array([0, 0, 2, 2, 1, 1])
        metric = PredsmIoU(3, 2)
        metric.update(gt, pred)
        miou, tp, fp, fn, _, bg = metric.compute(is_global_zero=True, many_to_one=True)
        assert miou == pytest.approx(1.0)

    def test_streaming_equals_single_shot(self):
        rng = np.random.default_rng(3)
        gt = rng.integers(0, 4, size=(8, 16, 16))
        pred = rng.integers(0, 4, size=(8, 16, 16))
        m1 = PredsmIoU(4, 4)
        m1.update(gt, pred)
        m2 = PredsmIoU(4, 4)
        for i in range(8):
            m2.update(gt[i], pred[i])
        r1 = m1.compute(is_global_zero=True)
        r2 = m2.compute(is_global_zero=True)
        assert r1[0] == pytest.approx(r2[0])
        np.testing.assert_array_equal(m1._conf_mat, m2._conf_mat)

    def test_not_global_zero(self):
        metric = PredsmIoU(2, 2)
        assert metric.compute(is_global_zero=False) == (0.0, [], [], [], [], 0.0)

    def test_reordered_preds_remap(self):
        gt = np.array([1, 1, 0, 0])
        pred = np.array([0, 0, 1, 1])  # swapped labels
        metric = PredsmIoU(2, 2)
        metric.update(gt, pred)
        miou, _, _, _, reordered, _ = metric.compute(is_global_zero=True)
        np.testing.assert_array_equal(reordered, gt)

    def test_legacy_adapter_swap(self):
        # compute_miou deliberately swaps gt/pred (reference parity); with a
        # symmetric perfect prediction the result is still 1.0.
        gt = np.array([0, 1, 0, 1])
        metric = PredsmIoU(2, 2)
        miou, *_ = metric.compute_miou(gt, gt, num_pred=2, num_gt=2)
        assert miou == pytest.approx(1.0)
