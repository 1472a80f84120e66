#!/usr/bin/env python3
"""Example: build an IVF index once, serialize it, evaluate from the
serialized index forever after.

The reference's ScaNN backend rebuilds its tree from the flat bank on
every run (reference hbird/nn/search_scann.py:21-33); hbird-tpu
serializes the BUILT index — leaf slabs, centroids, capacity-balanced
layout — to a `.treedir`, so later runs skip k-means + layout + scatter
and stream the slabs straight to the device (or directly onto a mesh).

Three equivalent surfaces, shown below with a synthetic VOC fixture and
an oracle feature extractor (runs anywhere, CPU included):

1. library:  nn.save_tree(d) / NearestNeighborSearchApprox.load_tree(d)
2. engine:   HbirdEvaluation(..., f_mem_p='idx.treedir'[, load_memory=True])
3. CLI:      eval.py --f-mem-p idx.treedir [--load-memory]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    # Site hooks may force a TPU platform at import; HBIRD_PLATFORM=cpu
    # pins the demo to CPU (the config update must come AFTER import).
    if os.environ.get("HBIRD_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["HBIRD_PLATFORM"])
    # Persistent compile cache: without it, remote-TPU compile noise
    # (minutes) would swamp the build-vs-restore timing this demo shows.
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    from hbird_tpu import hbird_evaluation
    from hbird_tpu.data.synthetic import make_voc_fixture

    root = os.path.join(tempfile.mkdtemp(), "voc")
    make_voc_fixture(root, n_train=24, n_val=8, size=(64, 48),
                     colorize=True, seed=3, class_pool=[1, 2, 3, 4, 5])
    treedir = os.path.join(tempfile.mkdtemp(), "idx.treedir")

    patch = 4

    def oracle_fn(model, imgs):
        b, c, h, w = imgs.shape
        s = h // patch
        x = imgs.reshape(b, c, s, patch, s, patch).mean(axis=(3, 5))
        return x.transpose(0, 2, 3, 1).reshape(b, s * s, c), None

    common = dict(
        model=None, ftr_extr_fn=oracle_fn, d_model=3, patch_size=patch,
        dataset_name="voc", data_dir=root, batch_size=4, input_size=32,
        n_neighbours=5, nn_method="ivf",
        nn_params={"num_leaves": 4, "num_leaves_to_search": 4,
                   "query_block": 16},
        num_workers=0, f_mem_p=treedir,
    )

    t0 = time.time()
    miou_build = hbird_evaluation(**common)
    t_build = time.time() - t0
    print(f"build run: mIoU={miou_build:.4f} in {t_build:.1f}s "
          f"(index serialized to {treedir})")

    t0 = time.time()
    miou_load = hbird_evaluation(**common, load_memory=True)
    t_load = time.time() - t0
    print(f"load  run: mIoU={miou_load:.4f} in {t_load:.1f}s "
          "(restored index; no k-means/layout/scatter, train set untouched)")
    assert abs(miou_build - miou_load) < 1e-6
    print("identical mIoU from the serialized index.")


if __name__ == "__main__":
    main()
