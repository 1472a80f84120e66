#!/usr/bin/env python3
"""Example: plugging a custom feature extractor into the evaluation.

Mirrors the reference's extractor-function protocol (reference
README.md:147, eval.py:262-309): any callable (model, imgs) -> (B, N, D)
patch tokens works — a flax module, a haiku transform, or plain jnp math.
This demo uses a random-weight hbird_tpu ViT via an explicit function on a
synthetic colorized VOC fixture, so it runs anywhere without checkpoints.
"""

import tempfile

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from hbird_tpu import hbird_evaluation
from hbird_tpu.data.synthetic import make_voc_fixture
from hbird_tpu.models.vit import ViT, ViTConfig

INPUT, PATCH = 64, 8


def main():
    cfg = ViTConfig(patch_size=PATCH, width=128, depth=4, num_heads=4, img_size=INPUT)
    vit = ViT(cfg)
    params = vit.init(jax.random.PRNGKey(0))

    def extractor(model, imgs):
        # `model` is whatever you passed as `model=`; here the params pytree.
        return vit.apply(model, imgs)["x_norm_patchtokens"], None

    root = tempfile.mkdtemp() + "/voc"
    make_voc_fixture(root, n_train=16, n_val=8, size=(96, 96), colorize=True)

    miou = hbird_evaluation(
        model=params,
        ftr_extr_fn=extractor,
        d_model=cfg.width,
        patch_size=PATCH,
        dataset_name="voc",
        data_dir=root,
        batch_size=8,
        input_size=INPUT,
        n_neighbours=10,
        nn_method="exact",
        num_workers=2,
    )
    print(f"mIoU (random ViT on synthetic fixture): {float(miou):.4f}")


if __name__ == "__main__":
    main()
