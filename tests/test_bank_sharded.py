"""Sharded on-disk bank format: streaming round-trip + mesh placement."""

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
