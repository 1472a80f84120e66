"""Golden tests against the ACTUAL reference implementation.

The reference checkout (read-only, /root/reference) has importable pure
modules — `hbird/utils/eval_metrics.py` depends only on torch/numpy/scipy.
Loading it directly gives the strongest possible parity oracle for the
metric: identical streams must produce identical mIoU / TP / FP / FN /
reordered predictions.
"""

import importlib.util
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_METRICS = "/root/reference/hbird/utils/eval_metrics.py"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(REF_METRICS), reason="reference checkout not mounted"
)


@pytest.fixture(scope="module")
def ref_metrics_module():
    spec = importlib.util.spec_from_file_location("ref_eval_metrics", REF_METRICS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _random_stream(seed, n=50_000, g=21, p=21, ignore=255):
    rng = np.random.default_rng(seed)
    gt = rng.integers(0, g, size=n)
    gt[rng.random(n) < 0.05] = ignore
    # predictions correlated with gt + noise + a label permutation
    perm = rng.permutation(p)
    pred = perm[np.minimum(gt, g - 1) % p]
    noise = rng.random(n) < 0.3
    pred[noise] = rng.integers(0, p, size=noise.sum())
    return gt, pred


class TestMetricGoldenParity:
    @pytest.mark.parametrize("seed", [0, 1])
    @pytest.mark.parametrize(
        "kwargs",
        [
            dict(),  # Hungarian default (reference call site hbird_eval.py:253)
            dict(many_to_one=True),
            dict(many_to_one=True, precision_based=True),
            dict(linear_probe=True),
        ],
    )
    @pytest.mark.slow
    def test_compute_matches_reference(self, ref_metrics_module, seed, kwargs):
        from hbird_tpu.utils.eval_metrics import PredsmIoU

        gt, pred = _random_stream(seed)

        ref = ref_metrics_module.PredsmIoU(21, 21, ignore_index=255)
        ref.update(torch.from_numpy(gt), torch.from_numpy(pred))
        r_miou, r_tp, r_fp, r_fn, r_reordered, r_bg = ref.compute(
            is_global_zero=True, **kwargs
        )

        ours = PredsmIoU(21, 21, ignore_index=255)
        ours.update(gt, pred)
        o_miou, o_tp, o_fp, o_fn, o_reordered, o_bg = ours.compute(
            is_global_zero=True, **kwargs
        )

        assert o_miou == pytest.approx(float(r_miou), abs=1e-10)
        assert list(map(int, o_tp)) == list(map(int, r_tp))
        assert list(map(int, o_fp)) == list(map(int, r_fp))
        assert list(map(int, o_fn)) == list(map(int, r_fn))
        assert o_bg == pytest.approx(float(r_bg), abs=1e-12)
        np.testing.assert_array_equal(
            np.asarray(o_reordered), np.asarray(r_reordered)
        )

    def test_streamed_updates_match_reference(self, ref_metrics_module):
        from hbird_tpu.utils.eval_metrics import PredsmIoU

        gt, pred = _random_stream(7, n=30_000)
        ref = ref_metrics_module.PredsmIoU(21, 21, ignore_index=255)
        ours = PredsmIoU(21, 21, ignore_index=255)
        for i in range(0, 30_000, 7000):  # ragged chunks
            ref.update(
                torch.from_numpy(gt[i : i + 7000]), torch.from_numpy(pred[i : i + 7000])
            )
            ours.update(gt[i : i + 7000], pred[i : i + 7000])
        r = ref.compute(is_global_zero=True)
        o = ours.compute(is_global_zero=True)
        assert o[0] == pytest.approx(float(r[0]), abs=1e-10)
        np.testing.assert_array_equal(
            np.asarray(ours._conf_mat), ref._conf_mat.cpu().numpy()
        )

    def test_legacy_adapter_matches_reference(self, ref_metrics_module):
        from hbird_tpu.utils.eval_metrics import PredsmIoU

        gt, pred = _random_stream(9, n=10_000)
        gt = np.where(gt == 255, 0, gt)  # adapter path has no ignore masking need
        ref = ref_metrics_module.PredsmIoU(21, 21)
        ours = PredsmIoU(21, 21)
        r = ref.compute_miou(gt, pred, num_pred=21, num_gt=21)
        o = ours.compute_miou(gt, pred, num_pred=21, num_gt=21)
        assert o[0] == pytest.approx(float(r[0]), abs=1e-10)
        assert list(map(int, o[1])) == list(map(int, r[1]))
