"""Sharded on-disk bank format: streaming round-trip + mesh placement."""

import os

import numpy as np
import pytest

import jax

from hbird_tpu.bank.io import (
    is_sharded_path,
    iter_memory_chunks,
    load_memory,
    load_memory_sharded,
    memory_path_on_disk,
    save_memory,
    save_memory_sharded,
    sharded_memory_info,
)
from hbird_tpu.parallel import make_mesh


class TestRoundTrip:
    def test_streaming_generator_roundtrip(self, tmp_path):
        """Write from a generator of blocks (no whole-bank array on the
        writer side), read back chunk-by-chunk (mmap; no whole-bank array
        on the reader side) and compare."""
        rows, dim, blk_rows = 10_000, 16, 1_337
        rng = np.random.default_rng(0)
        blocks = [
            rng.normal(size=(min(blk_rows, rows - s), dim)).astype(np.float32)
            for s in range(0, rows, blk_rows)
        ]
        d = str(tmp_path / "bank.bankdir")
        save_memory_sharded(iter(blocks), d, chunk_rows=2048)
        info = sharded_memory_info(d)
        assert info["rows"] == rows and info["dim"] == dim
        full = np.concatenate(blocks)
        pos = 0
        for start, chunk in iter_memory_chunks(d):
            np.testing.assert_array_equal(chunk, full[start : start + chunk.shape[0]])
            pos = start + chunk.shape[0]
        assert pos == rows

    def test_bfloat16_bank_roundtrip(self, tmp_path):
        """np.save writes ml_dtypes.bfloat16 chunks as raw void bytes;
        the manifest's dtype must view them back bit-exactly on every
        read path (host load, mesh load), and a flat .npy save widens to
        f32 (no manifest to view back through)."""
        import jax.numpy as jnp
        import ml_dtypes

        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(1000, 16)), jnp.bfloat16
        )
        bits = np.asarray(x).view(np.uint16)
        d = str(tmp_path / "b.bankdir")
        save_memory_sharded(x, d, chunk_rows=300)
        y = load_memory_sharded(d)
        assert y.dtype == ml_dtypes.bfloat16
        np.testing.assert_array_equal(y.view(np.uint16), bits)

        mesh = make_mesh((4,), ("bank",))
        arr, rows = load_memory_sharded(d, mesh=mesh)
        assert arr.dtype == jnp.bfloat16 and rows == 1000
        np.testing.assert_array_equal(
            np.asarray(arr[:1000]).view(np.uint16), bits
        )

        p = str(tmp_path / "m.npy")
        save_memory(np.asarray(x), p)
        np.testing.assert_allclose(
            load_memory(p), np.asarray(x, np.float32), atol=0
        )

    def test_sliceable_source_and_chunking(self, tmp_path):
        rng = np.random.default_rng(1)
        mem = rng.normal(size=(5000, 8)).astype(np.float32)
        d = str(tmp_path / "b.bankdir")
        save_memory_sharded(mem, d, chunk_rows=640)
        info = sharded_memory_info(d)
        assert len(info["chunks"]) == -(-5000 // 640)
        np.testing.assert_array_equal(load_memory_sharded(d), mem)

    def test_save_memory_dispatch(self, tmp_path):
        mem = np.arange(40, dtype=np.float32).reshape(10, 4)
        p = str(tmp_path / "x.bankdir")
        written = save_memory(mem, p)
        assert written == p and is_sharded_path(p)
        assert memory_path_on_disk(p) == p
        np.testing.assert_array_equal(load_memory(p), mem)


class TestMeshPlacement:
    def test_mesh_load_matches_shard_bank(self, tmp_path):
        from hbird_tpu.parallel.sharded_knn import shard_bank

        rng = np.random.default_rng(2)
        rows, dim = 1000, 12  # not divisible by 8 -> padding exercised
        mem = rng.normal(size=(rows, dim)).astype(np.float32)
        d = str(tmp_path / "m.bankdir")
        save_memory_sharded(mem, d, chunk_rows=333)

        mesh = make_mesh((8,), ("bank",))
        arr, valid = load_memory_sharded(d, mesh=mesh)
        assert valid == rows
        ref, _, ref_valid = shard_bank(
            mem, np.zeros((rows, 1), np.float32), mesh
        )
        assert ref_valid == rows
        assert arr.shape == ref.shape
        np.testing.assert_array_equal(np.asarray(arr), np.asarray(ref))
        # Placement really is row-sharded over the bank axis.
        assert len(arr.sharding.device_set) == 8

    def test_mesh_load_searches_correctly(self, tmp_path):
        from hbird_tpu.ops.knn import exact_knn
        from hbird_tpu.parallel.sharded_knn import sharded_knn_with_labels

        rng = np.random.default_rng(3)
        rows, dim, k = 500, 16, 5
        mem = rng.normal(size=(rows, dim)).astype(np.float32)
        mem /= np.linalg.norm(mem, axis=1, keepdims=True)
        d = str(tmp_path / "s.bankdir")
        save_memory_sharded(mem, d, chunk_rows=100)
        mesh = make_mesh((4,), ("bank",))
        bank, valid = load_memory_sharded(d, mesh=mesh)
        labels = jax.device_put(
            np.zeros((bank.shape[0], 1), np.float32), bank.sharding
        )
        q = rng.normal(size=(32, dim)).astype(np.float32)
        vals, idx, _ = sharded_knn_with_labels(
            q, bank, labels, k, mesh=mesh, valid_rows=valid, kernel="xla"
        )
        _, ref_idx = exact_knn(q, mem, k)
        np.testing.assert_array_equal(
            np.sort(np.asarray(idx), -1), np.sort(np.asarray(ref_idx), -1)
        )


class TestEngineBankdirIntegration:
    def test_engine_save_and_reload_bankdir(self, tmp_path):
        import jax.numpy as jnp

        from hbird_tpu import HbirdEvaluation
        from hbird_tpu.models import FeatureExtractorSimple

        B, INPUT, PATCH, C, D = 2, 16, 4, 4, 8
        S = INPUT // PATCH
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(3 * PATCH * PATCH, D)).astype(np.float32))

        def fn(model, imgs):
            b = imgs.shape[0]
            xx = imgs.reshape(b, 3, S, PATCH, S, PATCH)
            xx = xx.transpose(0, 2, 4, 1, 3, 5).reshape(b, S * S, -1)
            return xx @ model, None

        fe = FeatureExtractorSimple(w, fn, eval_spatial_resolution=S, d_model=D)
        imgs = rng.integers(0, 255, (2 * B, 3, INPUT, INPUT), dtype=np.uint8)
        ids = rng.integers(0, C, (2 * B, 1, INPUT, INPUT)).astype(np.uint8)
        loader = [(imgs[:B], ids[:B]), (imgs[B:], ids[B:])]

        f_p = str(tmp_path / "fmem.bankdir")
        l_p = str(tmp_path / "lmem.bankdir")
        ev = HbirdEvaluation(
            fe, loader, num_classes=C, n_neighbours=3, nn_method="exact",
            f_mem_p=f_p, l_mem_p=l_p,
        )
        saved = np.asarray(ev.feature_memory)
        assert os.path.isfile(os.path.join(f_p, "manifest.json"))

        # Wipe and reload through the engine's load hook.
        ev.feature_memory = None
        ev.label_memory = None
        assert ev.load_memory() is True
        np.testing.assert_allclose(
            np.asarray(ev.feature_memory), saved, rtol=1e-6
        )
        miou = ev.evaluate(loader, S, ignore_index=255)
        assert 0.0 <= float(miou) <= 1.0
