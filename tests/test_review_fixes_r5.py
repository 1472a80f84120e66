"""Round-5 review fixes: degenerate-mesh builds, flat-int8 contract,
int8_rows calibration ordering, compute() idempotency.

The round-5 headline features (mesh-native build, SQ8) were tested where
the mesh's bank axis has >1 shard; these pin the configurations the
review found broken:

- a mesh WITHOUT a bank axis (pure data-parallel eval) must build
  (replicated bank) instead of raising on NamedSharding(P("bank")),
- a bank axis of SIZE 1 still pads the accumulator, so the backends'
  unmeshed tails must honor the engine's valid_rows (no score-0 ghost
  neighbours from zero padding rows) — exact AND tree builds,
- the flat approx int8 path must honor an explicitly requested
  num_reordering_candidates exact rerank and must not re-quantize a
  pre-quantized injected bank,
- int8_rows probe calibration must rank by DEQUANTIZED dots (row_scale)
  like the runtime search,
- PredsmIoU.compute(sync_distributed=True) must be idempotent (local
  confusion matrix restored after the allgather).
"""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hbird_tpu import HbirdEvaluation
from hbird_tpu.data import get_dataset
from hbird_tpu.data.synthetic import make_voc_fixture
from hbird_tpu.data.transforms import get_hbird_val_transforms
from hbird_tpu.models import FeatureExtractorSimple
from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox
from hbird_tpu.nn.search_exact import NearestNeighborSearchExact
from hbird_tpu.parallel import make_mesh

INPUT = 32
PATCH = 4
S = INPUT // PATCH
N_TRAIN = 12


def oracle_fn(model, imgs):
    b, c, h, w = imgs.shape
    s = h // PATCH
    x = imgs.reshape(b, c, s, PATCH, s, PATCH).mean(axis=(3, 5))
    return x.transpose(0, 2, 3, 1).reshape(b, s * s, c), None


@pytest.fixture(scope="module")
def voc_color(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("voc_degen") / "voc")
    make_voc_fixture(
        root, n_train=N_TRAIN, n_val=6, size=(64, 48), colorize=True,
        seed=3, class_pool=[1, 2, 3, 4, 5],
    )
    return root


def _run(voc_color, mesh, *, nn_method="exact", nn_params=None, **kw):
    random.seed(0)
    va = get_hbird_val_transforms(INPUT)
    ds, _ = get_dataset("voc", voc_color, 4, 0, va, va, None, None)
    fe = FeatureExtractorSimple(
        None, oracle_fn, eval_spatial_resolution=S, d_model=3
    )
    ev = HbirdEvaluation(
        fe, ds.train_dataloader(), num_classes=21, n_neighbours=5,
        mesh=mesh, seed=7, nn_method=nn_method, nn_params=nn_params, **kw,
    )
    miou = ev.evaluate(ds.val_dataloader(), S, ignore_index=255)
    return ev, float(miou)


class TestDegenerateMeshBuilds:
    def test_data_only_mesh_builds_replicated(self, voc_color):
        # No 'bank' axis at all: round 4 supported this via the host
        # path; the mesh-native build must keep supporting it with a
        # replicated bank instead of raising on a missing mesh axis.
        mem = N_TRAIN * 9
        mesh = make_mesh((8,), ("data",))
        ev_m, miou_m = _run(
            voc_color, mesh, memory_size=mem, dataset_size=N_TRAIN
        )
        assert isinstance(ev_m.feature_memory, jax.Array)
        assert int(ev_m.NN_algorithm.valid_rows) == mem
        ev_1, miou_1 = _run(
            voc_color, None, memory_size=mem, dataset_size=N_TRAIN
        )
        assert miou_m == pytest.approx(miou_1, abs=1e-6)

    def test_bank_axis_size_one_masks_padding_exact(self, voc_color):
        # bank axis present but size 1: the backend takes its unmeshed
        # tail, which must still honor the engine's valid_rows (108 real
        # rows in a 112-row 8-aligned accumulator).
        mem = N_TRAIN * 9
        assert mem % 8 != 0, "fixture no longer exercises padding"
        mesh = make_mesh((2, 1), ("data", "bank"))
        ev_m, miou_m = _run(
            voc_color, mesh, memory_size=mem, dataset_size=N_TRAIN
        )
        assert ev_m.feature_memory.shape[0] > mem
        assert int(ev_m.NN_algorithm.valid_rows) == mem
        ev_1, miou_1 = _run(
            voc_color, None, memory_size=mem, dataset_size=N_TRAIN
        )
        assert miou_m == pytest.approx(miou_1, abs=1e-6)

    def test_bank_axis_size_one_ivf_excludes_padding(self, voc_color):
        # Same degenerate mesh through the tree build: padding rows must
        # not be clustered into leaves (full probe => unmeshed equality).
        mem = N_TRAIN * 9
        params = {"num_leaves": 4, "num_leaves_to_search": 4}
        mesh = make_mesh((2, 1), ("data", "bank"))
        ev_m, miou_m = _run(
            voc_color, mesh, nn_method="ivf", nn_params=dict(params),
            memory_size=mem, dataset_size=N_TRAIN,
        )
        nn = ev_m.NN_algorithm
        assert int(nn.valid_rows) == mem
        assert int(np.asarray(nn.leaf_valid).sum()) == mem
        ev_1, miou_1 = _run(
            voc_color, None, nn_method="ivf", nn_params=dict(params),
            memory_size=mem, dataset_size=N_TRAIN,
        )
        assert miou_m == pytest.approx(miou_1, abs=1e-6)


def _ghost_bank(m=512, d=16, q_n=32, seed=0):
    """Bank + queries whose true dot products are ALL NEGATIVE, so any
    zero padding row scores 0 and wins — the ghost-neighbour trigger."""
    rng = np.random.default_rng(seed)
    bank = np.abs(rng.normal(size=(m, d))).astype(np.float32)
    q = -np.abs(rng.normal(size=(q_n, d))).astype(np.float32)
    return bank, q


class TestInjectedValidRowsUnmeshed:
    def test_exact_unmeshed_tail_masks_injected_padding(self):
        bank, q = _ghost_bank()
        padded = np.concatenate([bank, np.zeros((16, 16), np.float32)])
        nn = NearestNeighborSearchExact(
            jnp.asarray(padded), n_neighbors=5, valid_rows=bank.shape[0],
            query_block=32, bank_block=128,
        )
        assert int(nn.valid_rows) == bank.shape[0]
        idx, vals = nn.find_nearest_neighbors(q, 5)
        assert idx.max() < bank.shape[0]
        assert (vals < 0).all()  # ghost rows would score exactly 0

    def test_tree_build_excludes_injected_padding(self):
        bank, q = _ghost_bank(seed=1)
        padded = np.concatenate([bank, np.zeros((16, 16), np.float32)])
        nn = NearestNeighborSearchApprox(
            jnp.asarray(padded), n_neighbors=5, use_tree=True,
            valid_rows=bank.shape[0], num_leaves=4, num_leaves_to_search=4,
            query_block=32,
        )
        assert int(nn.valid_rows) == bank.shape[0]
        assert int(np.asarray(nn.leaf_valid).sum()) == bank.shape[0]
        idx, vals = nn.find_nearest_neighbors(q, 5)
        assert idx.max() < bank.shape[0]
        assert (vals < 0).all()


def _mixed_range_bank(rng, m, d):
    bank = rng.normal(size=(m, d)).astype(np.float32)
    bank *= 10.0 ** rng.uniform(-2, 0, size=(m, 1)).astype(np.float32)
    return bank


def _recall(idx, ref_idx):
    k = idx.shape[1]
    return np.mean([
        len(set(idx[i]) & set(ref_idx[i])) / k for i in range(idx.shape[0])
    ])


class TestFlatInt8Contract:
    def _decoy_bank(self, seed=2, m=4096, d=64, q_n=256):
        """Global int8 recall visibly < 1 (decoy rows set the scale)."""
        rng = np.random.default_rng(seed)
        half = d // 2
        bank = np.zeros((m, d), np.float32)
        bank[:64, :half] = 100.0 * rng.normal(size=(64, half))
        small = rng.normal(size=(m - 64, half)).astype(np.float32)
        small /= np.linalg.norm(small, axis=1, keepdims=True)
        bank[64:, half:] = small
        q = np.zeros((q_n, d), np.float32)
        qs = rng.normal(size=(q_n, half)).astype(np.float32)
        q[:, half:] = qs / np.linalg.norm(qs, axis=1, keepdims=True)
        return bank, q

    def test_flat_int8_honors_requested_rerank(self):
        # ScaNN-literal quantized+reorder config: use_int8 +
        # num_reordering_candidates must deliver exact-recall results
        # (round-5 regression: the rerank was silently dropped).
        # Mixed-range rows give MODERATE quantization noise: the top-120
        # shortlist still contains the true top-10, so the exact rerank
        # can (and must) restore recall ~1.0.
        rng = np.random.default_rng(2)
        bank = _mixed_range_bank(rng, 4096, 64)
        q = rng.normal(size=(256, 64)).astype(np.float32)
        k = 10
        exact = NearestNeighborSearchApprox(
            bank, n_neighbors=k, use_fp16=False,
            query_block=64, bank_block=512,
        )
        plain = NearestNeighborSearchApprox(
            bank, n_neighbors=k, use_int8=True,
            query_block=64, bank_block=512,
        )
        rerank = NearestNeighborSearchApprox(
            bank, n_neighbors=k, use_int8=True,
            num_reordering_candidates=120,
            query_block=64, bank_block=512,
        )
        assert rerank.rerank_bank is not None
        idx_e = exact.find_nearest_neighbors(q, k)[0]
        idx_p = plain.find_nearest_neighbors(q, k)[0]
        idx_r, vals_r = rerank.find_nearest_neighbors(q, k)
        r_plain, r_rerank = _recall(idx_p, idx_e), _recall(idx_r, idx_e)
        assert r_plain < 0.995, "fixture no longer separates the paths"
        # Rerank re-scores in bf16 (near-tie flips vs the f32 oracle are
        # by design, same as the exact backend's rerank), so ~0.998+.
        assert r_rerank > 0.995, (r_rerank, r_plain)
        assert r_rerank > r_plain + 0.005, (r_rerank, r_plain)
        # Reranked scores are exact bf16 dots, not quantized ones
        # (relative bound: bf16 carries ~8 mantissa bits).
        vals_e = exact.find_nearest_neighbors(q, k)[1]
        rel = np.abs(vals_r - vals_e).max() / np.abs(vals_e).max()
        assert rel < 0.01, rel

    def test_flat_int8_prequantized_injection_keeps_scale(self):
        rng = np.random.default_rng(3)
        bank = rng.normal(size=(1024, 32)).astype(np.float32)
        q = rng.normal(size=(64, 32)).astype(np.float32)
        scale = float(np.abs(bank).max() / 127.0)
        codes = np.clip(np.round(bank / scale), -127, 127).astype(np.int8)

        direct = NearestNeighborSearchApprox(
            bank, n_neighbors=5, use_int8=True,
            query_block=64, bank_block=512,
        )
        injected = NearestNeighborSearchApprox(
            jnp.asarray(codes), n_neighbors=5, use_int8=True,
            bank_scale=scale, query_block=64, bank_block=512,
        )
        # The injected codes must be used as-is (no re-quantization of
        # codes-as-floats) and the injected scale preserved.
        assert float(injected._bank_scale) == pytest.approx(scale, rel=1e-6)
        np.testing.assert_array_equal(
            np.asarray(injected.bank), codes
        )
        iv, vv = injected.find_nearest_neighbors(q, 5)
        dv, dd = direct.find_nearest_neighbors(q, 5)
        np.testing.assert_array_equal(iv, dv)
        np.testing.assert_allclose(vv, dd, rtol=1e-5, atol=1e-6)

    def test_flat_int8_rows_rejects_prequantized(self):
        codes = np.zeros((64, 8), np.int8)
        with pytest.raises(AssertionError):
            NearestNeighborSearchApprox(
                jnp.asarray(codes), n_neighbors=5,
                quantization="int8_rows", bank_scale=1.0,
            )


class TestCalibrationRowScale:
    def test_calibration_ranks_dequantized(self):
        # Premise: on a mixed-range bank, raw code-dot ordering differs
        # from the dequantized ordering the runtime ranks by.
        from hbird_tpu.ops.ivf import ivf_search

        rng = np.random.default_rng(4)
        bank = _mixed_range_bank(rng, 2048, 32)
        nn = NearestNeighborSearchApprox(
            bank, n_neighbors=8, use_tree=True, quantization="int8_rows",
            num_leaves=4, num_leaves_to_search=4, query_block=64,
        )
        q = nn.bank[:128]
        _, idx_raw = ivf_search(
            q, nn.bank, nn.centroids, nn.leaf_valid, 8, cap=nn._cap,
            n_probe=4, block_q=64,
        )
        _, idx_deq = ivf_search(
            q, nn.bank, nn.centroids, nn.leaf_valid, 8, cap=nn._cap,
            n_probe=4, block_q=64, row_scale=nn._bank_row_scale,
        )
        assert _recall(np.asarray(idx_raw), np.asarray(idx_deq)) < 0.999, (
            "fixture no longer separates raw vs dequantized ordering"
        )
        # Calibration must achieve its target against the RUNTIME
        # (dequantized) ordering.
        probe = nn.calibrate_n_probe(0.95, n_queries=256, seed=0)
        assert 1 <= probe <= 4
        nn.num_leaves_to_search = probe
        oracle = NearestNeighborSearchApprox(
            bank, n_neighbors=8, use_tree=True, quantization="int8_rows",
            num_leaves=4, num_leaves_to_search=4, query_block=64,
        )
        qf = _mixed_range_bank(np.random.default_rng(5), 256, 32)
        idx_c = nn.find_nearest_neighbors(qf, 8)[0]
        idx_o = oracle.find_nearest_neighbors(qf, 8)[0]
        assert _recall(idx_c, idx_o) >= 0.9


class TestComputeIdempotent:
    def test_synced_compute_twice_returns_same_counts(self, monkeypatch):
        from jax.experimental import multihost_utils

        from hbird_tpu.utils.eval_metrics import PredsmIoU

        metric = PredsmIoU(3, 3, ignore_index=255)
        rng = np.random.default_rng(6)
        gt = rng.integers(0, 3, size=2048)
        pred = rng.integers(0, 3, size=2048)
        metric.update(gt, pred)
        local = metric._conf_mat.copy()

        # Simulate 2 identical processes: allgather returns both copies.
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(
            multihost_utils, "process_allgather",
            lambda x: jnp.stack([jnp.asarray(x), jnp.asarray(x)]),
        )
        r1 = metric.compute(
            True, sync_distributed=True, return_reordered=False
        )
        # The local matrix must be restored (idempotency): a second
        # compute must NOT allgather the already-summed matrix.
        np.testing.assert_array_equal(metric._conf_mat, local)
        r2 = metric.compute(
            True, sync_distributed=True, return_reordered=False
        )
        assert r1[0] == pytest.approx(r2[0])
        assert r1[1] == r2[1] and r1[2] == r2[2] and r1[3] == r2[3]
        # Counts are the 2-process global sum, not 4x the local ones.
        assert sum(r1[1]) + sum(r1[2]) <= 2 * local.sum()
