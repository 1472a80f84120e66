"""Mesh-native memory build (VERDICT r4 #1).

With a mesh, HbirdEvaluation._create_memory accumulates bank rows
straight into a bank-axis-sharded device array via donated
dynamic_update_slice writes — the TPU analogue of Faiss per-GPU
index.add (reference hbird/nn/search_faiss.py:78-81). These tests pin:

- the built memory is a jax.Array sharded over the bank axis (no
  O(bank) host array in the meshed build),
- shard padding is masked out through the backend's valid_rows (never
  surfaces as ghost neighbours),
- mIoU equals the unmeshed single-device engine bit-for-bit,
- persistence saves only the real rows (padding trimmed).
"""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from hbird_tpu import HbirdEvaluation
from hbird_tpu.data import get_dataset
from hbird_tpu.data.synthetic import make_voc_fixture
from hbird_tpu.data.transforms import get_hbird_val_transforms
from hbird_tpu.models import FeatureExtractorSimple
from hbird_tpu.parallel import make_mesh
from hbird_tpu.parallel.sharded_knn import pad_rows_for_mesh

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
    root = str(tmp_path_factory.mktemp("voc_mesh") / "voc")
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


class TestMeshNativeBuild:
    def test_bounded_build_is_device_sharded_and_matches_oracle(
        self, voc_color
    ):
        # 9 sampled patches/img x 12 imgs = 108 rows -> pads to 112 on a
        # 4-shard bank axis (8-aligned): the padding mask is exercised.
        mem = N_TRAIN * 9
        mesh = make_mesh((2, 4), ("data", "bank"))
        ev_m, miou_m = _run(
            voc_color, mesh, memory_size=mem, dataset_size=N_TRAIN
        )
        assert isinstance(ev_m.feature_memory, jax.Array)
        assert ev_m.feature_memory.sharding.is_equivalent_to(
            NamedSharding(mesh, P("bank")), 2
        )
        padded = pad_rows_for_mesh(mem, 4)
        assert padded > mem, "fixture no longer exercises padding"
        assert ev_m.feature_memory.shape[0] == padded
        assert ev_m._bank_valid_rows == mem
        assert int(ev_m.NN_algorithm.valid_rows) == mem
        # Padding rows must be zero (masked in search, zero if probed).
        tail = np.asarray(ev_m.feature_memory)[mem:]
        assert (tail == 0).all()

        ev_1, miou_1 = _run(
            voc_color, None, memory_size=mem, dataset_size=N_TRAIN
        )
        assert miou_m == pytest.approx(miou_1, abs=1e-6)

    def test_unbounded_known_size_matches_oracle(self, voc_color):
        mesh = make_mesh((2, 4), ("data", "bank"))
        ev_m, miou_m = _run(voc_color, mesh, dataset_size=N_TRAIN)
        assert isinstance(ev_m.feature_memory, jax.Array)
        assert ev_m.feature_memory.sharding.is_equivalent_to(
            NamedSharding(mesh, P("bank")), 2
        )
        rows = N_TRAIN * S * S
        assert ev_m._bank_valid_rows == rows
        ev_1, miou_1 = _run(voc_color, None, dataset_size=N_TRAIN)
        assert miou_m == pytest.approx(miou_1, abs=1e-6)

    def test_unbounded_unknown_size_stays_on_device(self, voc_color):
        # No dataset_size: meshed chunked accumulation (device chunks +
        # one concatenate) — still no host round-trip, backend reshards.
        mesh = make_mesh((2, 4), ("data", "bank"))
        ev_m, miou_m = _run(voc_color, mesh)
        assert isinstance(ev_m.feature_memory, jax.Array)
        ev_1, miou_1 = _run(voc_color, None)
        assert miou_m == pytest.approx(miou_1, abs=1e-6)

    def test_short_fill_masks_instead_of_trimming(self, voc_color):
        # dataset_size larger than the loader actually yields: the meshed
        # bank keeps its padded allocation and masks via valid_rows.
        mem = (N_TRAIN + 4) * 9
        mesh = make_mesh((1, 8), ("data", "bank"))
        ev_m, miou_m = _run(
            voc_color, mesh, memory_size=mem, dataset_size=N_TRAIN + 4
        )
        filled = N_TRAIN * 9
        assert ev_m._bank_valid_rows == filled
        assert int(ev_m.NN_algorithm.valid_rows) == filled
        assert ev_m.feature_memory.shape[0] >= mem  # not trimmed
        ev_1, miou_1 = _run(
            voc_color, None, memory_size=mem, dataset_size=N_TRAIN + 4
        )
        # Unmeshed path trims to `filled`; results must agree.
        assert ev_1.feature_memory.shape[0] == filled
        assert miou_m == pytest.approx(miou_1, abs=1e-6)

    def test_meshed_ivf_tree_from_device_bank(self, voc_color):
        # Tree build consumes the padded sharded bank; padding rows must
        # not enter leaves (full probe budget -> equality with unmeshed).
        mem = N_TRAIN * 9
        params = {"num_leaves": 8, "num_leaves_to_search": 8,
                  "shard_probe": "full"}
        mesh = make_mesh((1, 4), ("data", "bank"))
        ev_m, miou_m = _run(
            voc_color, mesh, nn_method="ivf", nn_params=dict(params),
            memory_size=mem, dataset_size=N_TRAIN,
        )
        assert int(ev_m.NN_algorithm.valid_rows) == mem
        ev_1, miou_1 = _run(
            voc_color, None, nn_method="ivf", nn_params=dict(params),
            memory_size=mem, dataset_size=N_TRAIN,
        )
        assert miou_m == pytest.approx(miou_1, abs=1e-6)

    def test_save_trims_padding(self, voc_color, tmp_path):
        mem = N_TRAIN * 9
        mesh = make_mesh((1, 4), ("data", "bank"))
        f_npy = str(tmp_path / "feat.npy")
        l_npy = str(tmp_path / "lab.npy")
        ev_m, _ = _run(
            voc_color, mesh, memory_size=mem, dataset_size=N_TRAIN,
            f_mem_p=f_npy, l_mem_p=l_npy,
        )
        saved = np.load(f_npy)
        assert saved.shape[0] == mem
        np.testing.assert_array_equal(
            saved, np.asarray(ev_m.feature_memory)[:mem]
        )
        assert np.load(l_npy).shape[0] == mem

    def test_save_bankdir_trims_padding(self, voc_color, tmp_path):
        from hbird_tpu.bank.io import load_memory

        mem = N_TRAIN * 9
        mesh = make_mesh((1, 4), ("data", "bank"))
        f_dir = str(tmp_path / "feat.bankdir")
        ev_m, _ = _run(
            voc_color, mesh, memory_size=mem, dataset_size=N_TRAIN,
            f_mem_p=f_dir,
        )
        loaded = load_memory(f_dir)
        assert loaded.shape[0] == mem
        np.testing.assert_allclose(
            loaded, np.asarray(ev_m.feature_memory)[:mem], rtol=1e-6
        )
