#!/usr/bin/env python3
"""Example: Hummingbird evaluation of DINOv2 ViT-B/14 on Pascal VOC.

Equivalent of the reference's example notebooks (reference
examples/hbird_eval_example_*.ipynb) as a runnable script. Requires a
locally downloaded torch checkpoint (this host has no network egress):

    python examples/evaluate_dinov2_voc.py \
        --checkpoint ckpts/dinov2_vitb14_pretrain.pth \
        --data-dir /data/voc --input-size 504 --memory-size 1024000
"""

import argparse

from hbird_tpu import hbird_evaluation
from hbird_tpu.models.convert import convert
from hbird_tpu.models.vit import ViT


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--input-size", type=int, default=504)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--memory-size", type=int, default=None)
    ap.add_argument("--mesh-bank", type=int, default=None)
    args = ap.parse_args()

    params, cfg = convert(args.checkpoint, family="dinov2")
    vit = ViT(cfg)

    mesh = None
    if args.mesh_bank:
        from hbird_tpu.parallel import make_mesh

        mesh = make_mesh((args.mesh_bank,), ("bank",))

    miou = hbird_evaluation(
        model=(vit, params),
        d_model=cfg.width,
        patch_size=cfg.patch_size,
        dataset_name="voc",
        data_dir=args.data_dir,
        batch_size=args.batch_size,
        input_size=args.input_size,
        augmentation_epoch=2,
        n_neighbours=30,
        nn_method="faiss",
        memory_size=args.memory_size,
        mesh=mesh,
        bf16_model=True,
    )
    print(f"VOC mIoU: {float(miou) * 100:.2f}")


if __name__ == "__main__":
    main()
