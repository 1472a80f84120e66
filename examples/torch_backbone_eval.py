#!/usr/bin/env python3
"""Example: evaluating a LIVE torch.nn.Module backbone.

The reference accepts any torch model object — torch.hub, timm, HF —
(reference README.md:147, eval.py:198-239). The TPU-native production
path converts weights once into the jittable pure-JAX ViT
(hbird_tpu/models/convert.py), but the pluggability itself is preserved:
`wrap_torch_backbone` runs the torch module eagerly on the host CPU per
batch and feeds its tokens into the evaluation engine's non-jitted path.

This demo uses a random-weight HuggingFace ViT (no network needed) on a
synthetic colorized VOC fixture. With network access, the same three
lines evaluate a real backbone:

    model = torch.hub.load('facebookresearch/dino:main', 'dino_vits16')
    fe = wrap_torch_backbone(model, eval_spatial_resolution=32, d_model=384)
    miou = hbird_evaluation(fe, d_model=384, patch_size=16, ...)

Run: python examples/torch_backbone_eval.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INPUT, PATCH = 32, 4
S = INPUT // PATCH


def main():
    if "--cpu" in sys.argv:
        # The axon sitecustomize overrides JAX_PLATFORMS; post-import
        # config update is the only reliable CPU switch on the dev host.
        import jax

        jax.config.update("jax_platforms", "cpu")
    import torch  # noqa: F401 — the point of this example
    from transformers import ViTConfig as HFViTConfig, ViTModel

    from hbird_tpu import hbird_evaluation
    from hbird_tpu.data.synthetic import make_voc_fixture
    from hbird_tpu.models import wrap_torch_backbone

    torch.manual_seed(0)
    hf_model = ViTModel(
        HFViTConfig(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=128, patch_size=PATCH, image_size=INPUT,
        ),
        add_pooling_layer=False,
    )

    fe = wrap_torch_backbone(
        hf_model, eval_spatial_resolution=S, d_model=64
    )

    with tempfile.TemporaryDirectory() as tmp:
        root = os.path.join(tmp, "voc")
        make_voc_fixture(
            root, n_train=12, n_val=6, size=(64, 48), colorize=True,
            seed=3, class_pool=[1, 2, 3, 4, 5],
        )
        miou = hbird_evaluation(
            fe,
            d_model=64,
            patch_size=PATCH,
            dataset_name="voc",
            data_dir=root,
            batch_size=4,
            input_size=INPUT,
            augmentation_epoch=1,
            n_neighbours=5,
            nn_method="exact",
            num_workers=0,
        )
    print(f"mIoU through the live torch backbone: {float(miou):.4f}")
    print("OK")


if __name__ == "__main__":
    main()
