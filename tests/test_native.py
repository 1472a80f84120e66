"""Native C++ host library tests (tar index, Hungarian) with build-on-demand."""

import os
import tarfile

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment as scipy_lsa

from hbird_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


class TestTarIndex:
    def test_matches_tarfile(self, tmp_path):
        # Includes a long path (>100 chars) to exercise GNU/PAX extensions.
        root = tmp_path / "content"
        files = {
            "a/b.txt": b"hello",
            "a/c/d.bin": bytes(range(256)),
            ("deep/" + "x" * 120 + "/long_name_file.dat"): b"L" * 1000,
            "empty.txt": b"",
        }
        for rel, payload in files.items():
            p = root / rel
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_bytes(payload)
        tar_path = str(tmp_path / "t.tar")
        with tarfile.open(tar_path, "w") as t:
            t.add(str(root), arcname="content")

        entries = {
            name: (off, size)
            for name, off, size, tf in native.tar_index(tar_path)
            if tf == "0"
        }
        with tarfile.open(tar_path) as t:
            for m in t.getmembers():
                if not m.isfile():
                    continue
                assert m.name in entries, m.name
                off, size = entries[m.name]
                assert size == m.size
                with open(tar_path, "rb") as f:
                    f.seek(off)
                    data = f.read(size)
                assert data == t.extractfile(m).read()

    def test_backend_uses_native_index(self, tmp_path):
        from hbird_tpu.data.backend import TarBackend

        root = tmp_path / "c"
        root.mkdir()
        (root / "x.txt").write_bytes(b"payload")
        tar_path = str(tmp_path / "b.tar")
        with tarfile.open(tar_path, "w") as t:
            t.add(str(root / "x.txt"), arcname="pre/x.txt")
        b = TarBackend(tar_path)
        assert b._index is not None  # native path active
        assert b.read("pre/x.txt") == b"payload"
        b.close()


class TestNativeHungarian:
    @pytest.mark.parametrize("shape", [(4, 4), (6, 9), (9, 6), (151, 151)])
    def test_matches_scipy(self, shape):
        rng = np.random.default_rng(sum(shape))
        cost = rng.uniform(size=shape)
        r1, c1 = native.hungarian(cost)
        r2, c2 = scipy_lsa(cost)
        assert np.isclose(cost[r1, c1].sum(), cost[r2, c2].sum())
        assert len(r1) == min(shape)
