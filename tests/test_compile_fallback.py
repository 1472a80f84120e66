"""Compile-budget fallback (VERDICT r2 #5): when the eval step's first
inline compile exceeds HBIRD_COMPILE_BUDGET and no AOT executable is
available, the engine must flip the process default merge mode to
'carry_lazy', retrace, and produce identical results."""

import numpy as np
import pytest

from hbird_tpu import HbirdEvaluation
from hbird_tpu.models import FeatureExtractorSimple
from hbird_tpu.ops import knn_pallas

INPUT, PATCH, C = 32, 4, 21
S = INPUT // PATCH


def oracle_fn(model, imgs):
    b, c, h, w = imgs.shape
    s = h // PATCH
    x = imgs.reshape(b, c, s, PATCH, s, PATCH).mean(axis=(3, 5))
    return x.transpose(0, 2, 3, 1).reshape(b, s * s, c), None


@pytest.fixture(autouse=True)
def _restore_merge_mode():
    before = knn_pallas.default_merge_mode()
    yield
    knn_pallas.set_default_merge_mode(before)


def _data(n, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.normal(size=(n, 3, INPUT, INPUT)).astype(np.float32)
    ids = (rng.integers(0, 5, (n, 1, INPUT, INPUT)) / 255.0).astype(np.float32)
    return [(imgs[i:i + 2], ids[i:i + 2]) for i in range(0, n, 2)]


def _run(monkeypatch, budget):
    if budget is None:
        monkeypatch.delenv("HBIRD_COMPILE_BUDGET", raising=False)
    else:
        monkeypatch.setenv("HBIRD_COMPILE_BUDGET", str(budget))
    fe = FeatureExtractorSimple(None, oracle_fn, eval_spatial_resolution=S,
                                d_model=3)
    ev = HbirdEvaluation(
        fe, _data(6), num_classes=C, n_neighbours=3, nn_method="exact",
    )
    assert ev._uses_pallas_carry() or budget == 0
    miou = ev.evaluate(_data(4, seed=1), S, ignore_index=255)
    return ev, float(miou)


class TestCompileBudgetFallback:
    @pytest.mark.slow  # ~15s: runs the engine twice (fallback + baseline)
    def test_fallback_fires_and_results_match(self, monkeypatch):
        # Baseline: generous budget -> no fallback, merge mode stays carry.
        ev_ok, miou_ok = _run(monkeypatch, None)
        assert not getattr(ev_ok, "_compile_fallback_used", False)
        assert knn_pallas.default_merge_mode() == "carry"

        # Fault injection: a budget below any real compile time -> the
        # first dispatch "times out" and the engine must fall back.
        ev_fb, miou_fb = _run(monkeypatch, 1e-4)
        assert getattr(ev_fb, "_compile_fallback_used", False)
        assert knn_pallas.default_merge_mode() == "carry_lazy"
        # carry and carry_lazy are semantically identical.
        assert abs(miou_fb - miou_ok) < 1e-6, (miou_fb, miou_ok)
        # The abandoned compile thread was joined at teardown.
        th = getattr(ev_fb, "_fallback_thread", None)
        assert th is not None and not th.is_alive()

    def test_budget_zero_disables(self, monkeypatch):
        ev, _ = _run(monkeypatch, 0)
        assert not getattr(ev, "_compile_fallback_used", False)
        assert knn_pallas.default_merge_mode() == "carry"
