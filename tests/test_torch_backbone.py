"""Live torch.nn.Module backbones through the full evaluation.

Proves the reference's "any torch model" pluggability (README.md:147,
models.py:119-235) survives the rebuild: an actual torch.nn.Module runs
per batch on the host (jittable=False eager engine path) inside
hbird_evaluation, end to end. The strongest check runs the SAME
random-weight HF ViT twice — once live-torch, once converted to the
pure-JAX ViT — and demands matching retrievals and mIoU.
"""

import random

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from hbird_tpu import hbird_evaluation  # noqa: E402
from hbird_tpu.data.synthetic import make_voc_fixture  # noqa: E402
from hbird_tpu.models import wrap_torch_backbone  # noqa: E402
from hbird_tpu.models.torch_adapter import make_torch_ftr_extr_fn  # noqa: E402

INPUT = 32
PATCH = 4
S = INPUT // PATCH


@pytest.fixture(scope="module")
def voc_color(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("voc_torch") / "voc")
    # Same geometry as test_engine's fixture: 5-class pool so ~6 of the
    # 21 metric classes are present (the 21-class mean caps at ~6/21;
    # a 3-class pool would cap it at ~0.19 and starve the assertion).
    make_voc_fixture(
        root, n_train=12, n_val=6, size=(64, 48), colorize=True, seed=3,
        class_pool=[1, 2, 3, 4, 5],
    )
    return root


class _PatchColorNet(torch.nn.Module):
    """Torch oracle: per-patch mean color (B, S*S, 3) — segmentation is
    recoverable, so the full pipeline must score high mIoU through the
    torch path."""

    def forward(self, x):
        b, c, h, w = x.shape
        s = h // PATCH
        x = x.reshape(b, c, s, PATCH, s, PATCH).mean(dim=(3, 5))
        return x.permute(0, 2, 3, 1).reshape(b, s * s, c)


def _small_hf_vit():
    from transformers import ViTConfig as HFViTConfig, ViTModel

    torch.manual_seed(0)
    return ViTModel(
        HFViTConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64, patch_size=PATCH, image_size=INPUT,
            num_channels=3,
        ),
        add_pooling_layer=False,
    )


class TestTorchBackboneEndToEnd:
    def test_torch_oracle_module_high_miou(self, voc_color):
        random.seed(1234)
        fe = wrap_torch_backbone(
            _PatchColorNet(), eval_spatial_resolution=S, d_model=3
        )
        assert fe.jittable is False
        miou = hbird_evaluation(
            fe, d_model=3, patch_size=PATCH, dataset_name="voc",
            data_dir=voc_color, batch_size=4, input_size=INPUT,
            augmentation_epoch=1, n_neighbours=5, nn_method="exact",
            num_workers=0,
        )
        # Perfect transfer on this fixture caps near 6 present classes/21
        # minus patch-boundary loss; chance (random features) sits ~0.03.
        assert float(miou) > 0.15, miou

    def test_live_torch_matches_converted_jax(self, voc_color):
        """Same weights, two execution paths: live torch module (eager,
        non-jittable) vs convert_hf_vit -> pure-JAX ViT (jitted, fused).
        Feature drift would move neighbour rankings; mIoU must agree."""
        from hbird_tpu.models import FeatureExtractor, ViT
        from hbird_tpu.models.convert import convert_hf_vit

        hf = _small_hf_vit()

        def run(fe):
            random.seed(77)  # identical augmentation stream both runs
            return float(
                hbird_evaluation(
                    fe, d_model=32, patch_size=PATCH, dataset_name="voc",
                    data_dir=voc_color, batch_size=4, input_size=INPUT,
                    augmentation_epoch=1, n_neighbours=5,
                    nn_method="exact", num_workers=0,
                )
            )

        miou_torch = run(
            wrap_torch_backbone(hf, eval_spatial_resolution=S, d_model=32)
        )
        sd = {k: v.numpy() for k, v in hf.state_dict().items()}
        params, cfg = convert_hf_vit(sd)
        vit = ViT(cfg)
        miou_jax = run(
            FeatureExtractor(
                vit, vit.prepare_params(params, INPUT),
                eval_spatial_resolution=S, d_model=32,
            )
        )
        assert abs(miou_torch - miou_jax) < 1e-3, (miou_torch, miou_jax)

    def test_adapter_output_contract(self):
        """Token extraction: HF ModelOutput, CLS drop, dict passthrough."""
        fn = make_torch_ftr_extr_fn()
        hf = _small_hf_vit().eval()
        imgs = np.random.default_rng(0).normal(
            size=(2, 3, INPUT, INPUT)
        ).astype(np.float32)
        tokens, attn = fn(hf, imgs)
        assert tokens.shape == (2, S * S, 32)  # CLS dropped
        assert attn is None

        class DictNet(torch.nn.Module):
            def forward(self, x):
                b = x.shape[0]
                return {"x_norm_patchtokens": torch.zeros(b, S * S, 8)}

        tokens, _ = fn(DictNet(), imgs)
        assert tokens.shape == (2, S * S, 8)  # patch-only: nothing dropped

    def test_adapter_hf_attention_maps(self):
        """return_attn=True: mean-head CLS->patch attention, min-max
        normalized (reference models.py:219-231 HF path) — rows span
        [0, 1] and the tokens are unchanged vs the no-attn call."""
        hf = _small_hf_vit().eval()
        imgs = np.random.default_rng(1).normal(
            size=(2, 3, INPUT, INPUT)
        ).astype(np.float32)
        tokens0, _ = make_torch_ftr_extr_fn()(hf, imgs)
        tokens, attn = make_torch_ftr_extr_fn(return_attn=True)(hf, imgs)
        np.testing.assert_allclose(tokens, tokens0, atol=1e-6)
        assert attn is not None and attn.shape == (2, S * S)
        assert attn.min() >= 0.0 and attn.max() <= 1.0 + 1e-6
        # min-max: every row touches both 0 and 1
        np.testing.assert_allclose(attn.min(axis=1), 0.0, atol=1e-6)
        np.testing.assert_allclose(attn.max(axis=1), 1.0, atol=1e-6)

    def test_adapter_attention_none_for_plain_module(self):
        """Non-HF modules without get_last_selfattention: attn stays None
        (the TypeError fallback keeps the plain forward working)."""
        fn = make_torch_ftr_extr_fn(return_attn=True)
        imgs = np.random.default_rng(2).normal(
            size=(2, 3, INPUT, INPUT)
        ).astype(np.float32)
        tokens, attn = fn(_PatchColorNet(), imgs)
        assert tokens.shape == (2, S * S, 3)
        assert attn is None

    def test_adapter_dino_style_get_last_selfattention(self):
        """DINO-hub style: a module exposing get_last_selfattention pays
        a second forward for the map when return_attn=True."""

        class DinoStyle(torch.nn.Module):
            def forward(self, x):
                b = x.shape[0]
                return torch.ones(b, S * S + 1, 8)

            def get_last_selfattention(self, x):
                b = x.shape[0]
                torch.manual_seed(3)
                return torch.rand(b, 2, S * S + 1, S * S + 1)

        tokens, attn = make_torch_ftr_extr_fn(return_attn=True)(
            DinoStyle(), np.zeros((2, 3, INPUT, INPUT), np.float32)
        )
        assert tokens.shape == (2, S * S, 8)  # CLS dropped
        assert attn is not None and attn.shape == (2, S * S)

    def test_adapter_freezes_module(self):
        net = _small_hf_vit()
        wrap_torch_backbone(net, eval_spatial_resolution=S, d_model=32)
        assert not any(p.requires_grad for p in net.parameters())
        assert not net.training
