"""PhaseTimer / trace hook tests."""

import time

from hbird_tpu.utils.profiling import PhaseTimer, maybe_trace


class TestPhaseTimer:
    def test_accumulates_and_rates(self):
        t = PhaseTimer()
        with t.phase("a", items=10):
            time.sleep(0.01)
        with t.phase("a", items=10):
            time.sleep(0.01)
        with t.phase("b"):
            pass
        s = t.summary()
        assert s["a"]["seconds"] >= 0.02
        assert s["a"]["items"] == 20
        assert s["a"]["items_per_sec"] > 0
        assert "items" not in s["b"]

    def test_add_items(self):
        t = PhaseTimer()
        with t.phase("x"):
            pass
        t.add_items("x", 5)
        assert t.summary()["x"]["items"] == 5

    def test_maybe_trace_noop(self, monkeypatch):
        monkeypatch.delenv("HBIRD_PROFILE_DIR", raising=False)
        with maybe_trace("phase"):
            pass  # must be zero-cost / no jax import side effects
