#!/usr/bin/env python3
"""Regression harness: reproduce the reference results table.

Runs the configurations of the reference README results table
(reference README.md:269-335 — VOC mIoU for DINO S/16, B/16 and DINOv2
S/14..G/14 at memory sizes 1024*{100,1000,10000}) and reports deltas.
Requires locally downloaded torch checkpoints; emits JSON.

    python scripts/regression.py --data-dir /data/voc \
        --ckpt dino_vits16=ckpts/dino_deitsmall16.pth \
        --ckpt dinov2_vitb14=ckpts/dinov2_vitb14.pth \
        --memory-sizes 102400 1024000 --out regression.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Published reference numbers (reference README.md:287-334; ScaNN backend,
# 2 augmentation epochs, 512 px DINO / 504 px DINOv2).
PUBLISHED = {
    ("dino_vits16", 102400): 37.2,
    ("dino_vits16", 1024000): 43.1,
    ("dino_vits16", 10240000): 46.6,
    ("dino_vitb16", 102400): 44.9,
    ("dino_vitb16", 1024000): 50.8,
    ("dino_vitb16", 10240000): 55.7,
    ("dinov2_vits14", 102400): 70.2,
    ("dinov2_vits14", 1024000): 74.9,
    ("dinov2_vits14", 10240000): 77.0,
    ("dinov2_vitb14", 102400): 69.1,
    ("dinov2_vitb14", 1024000): 74.6,
    ("dinov2_vitb14", 10240000): 76.9,
    ("dinov2_vitl14", 102400): 64.6,
    ("dinov2_vitl14", 1024000): 71.7,
    ("dinov2_vitl14", 10240000): 74.8,
    ("dinov2_vitg14", 102400): 62.3,
    ("dinov2_vitg14", 1024000): 69.9,
    ("dinov2_vitg14", 10240000): 73.6,
}

INPUT_SIZE = {"dino": 512, "dinov2": 504}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--ckpt", action="append", default=[], metavar="PRESET=PATH")
    ap.add_argument("--memory-sizes", type=int, nargs="+",
                    default=[102400, 1024000, 10240000])
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--nn-method", default="faiss")
    ap.add_argument("--mesh-bank", type=int, default=None)
    ap.add_argument("--out", default="regression.json")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    from hbird_tpu import hbird_evaluation
    from hbird_tpu.models.convert import convert
    from hbird_tpu.models.vit import VIT_PRESETS, ViT

    mesh = None
    if args.mesh_bank:
        from hbird_tpu.parallel import make_mesh

        mesh = make_mesh((args.mesh_bank,), ("bank",))

    results = {}
    for spec in args.ckpt:
        preset, path = spec.split("=", 1)
        family = "dinov2" if preset.startswith("dinov2") else "dino"
        params, cfg = convert(path, family=family)
        vit = ViT(cfg)
        for mem in args.memory_sizes:
            key = f"{preset}@{mem}"
            t0 = time.time()
            miou = hbird_evaluation(
                model=(vit, params),
                d_model=cfg.width,
                patch_size=cfg.patch_size,
                dataset_name="voc",
                data_dir=args.data_dir,
                batch_size=args.batch_size,
                input_size=INPUT_SIZE[family],
                augmentation_epoch=2,
                n_neighbours=30,
                nn_method=args.nn_method,
                memory_size=mem,
                mesh=mesh,
                bf16_model=True,
            )
            published = PUBLISHED.get((preset, mem))
            results[key] = {
                "miou": round(float(miou) * 100, 2),
                "published": published,
                "delta": (
                    round(float(miou) * 100 - published, 2) if published else None
                ),
                "wall_s": round(time.time() - t0, 1),
            }
            print(json.dumps({key: results[key]}), flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
