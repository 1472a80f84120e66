"""CLI parsing and compat-layer tests."""

import json

import pytest

from hbird_tpu.eval_cli import (
    NNBackend,
    RunConfig,
    _parse_nn_params,
    build_parser,
)


class TestParser:
    def test_required_and_defaults(self):
        p = build_parser()
        args = p.parse_args(
            ["--dataset-name", "voc", "--data-dir", "/d", "--d-model", "768",
             "--patch-size", "14"]
        )
        assert args.batch_size == 64
        assert args.input_size == 224
        assert args.nn_method == "scann"
        assert args.n_neighbours == 30
        assert args.ignore_index == 255
        assert args.augmentation_epoch == 1

    def test_memory_persistence_flags(self):
        p = build_parser()
        args = p.parse_args(
            ["--dataset-name", "voc", "--data-dir", "/d", "--d-model", "768",
             "--patch-size", "14", "--f-mem-p", "/tmp/idx.treedir",
             "--l-mem-p", "/tmp/lab.npy", "--load-memory"]
        )
        assert args.f_mem_p == "/tmp/idx.treedir"
        assert args.l_mem_p == "/tmp/lab.npy"
        assert args.load_memory is True
        # default off
        args2 = p.parse_args(
            ["--dataset-name", "voc", "--data-dir", "/d", "--d-model", "768",
             "--patch-size", "14"]
        )
        assert args2.f_mem_p is None and not args2.load_memory

    def test_nn_param_coercion(self):
        out = _parse_nn_params(
            ["num_leaves=512", "recall_target=0.9", "use_fp16=true", "name=abc"]
        )
        assert out == {
            "num_leaves": 512,
            "recall_target": 0.9,
            "use_fp16": True,
            "name": "abc",
        }

    def test_nn_param_invalid(self):
        import argparse

        with pytest.raises(argparse.ArgumentTypeError):
            _parse_nn_params(["bad-entry"])

    def test_fractional_dataset_name_passthrough(self):
        p = build_parser()
        args = p.parse_args(
            ["--dataset-name", "voc*0.2", "--data-dir", "/d", "--d-model", "384",
             "--patch-size", "16"]
        )
        assert args.dataset_name == "voc*0.2"

    def test_positive_int_validation(self):
        p = build_parser()
        with pytest.raises(SystemExit):
            p.parse_args(
                ["--dataset-name", "voc", "--data-dir", "/d", "--d-model", "-1",
                 "--patch-size", "16"]
            )

    def test_config_dataclasses(self):
        cfg = RunConfig(
            dataset_name="voc", data_dir="/d", d_model=768, patch_size=14,
            nn=NNBackend(nn_method="faiss", n_neighbours=10),
        )
        assert cfg.nn.nn_method == "faiss"
        assert cfg.compilation_cache == ".jax_cache"


class TestCompatLayer:
    def test_reference_import_paths(self):
        from hbird.hbird_eval import HbirdEvaluation, hbird_evaluation  # noqa: F401
        from hbird.models import FeatureExtractor, FeatureExtractorSimple  # noqa: F401
        from hbird.nn.search_base import NearestNeighborSearchBase  # noqa: F401
        from hbird.nn.search_faiss import NearestNeighborSearchFaiss
        from hbird.nn.search_scann import NearestNeighborSearchScaNN
        from hbird.utils.eval_metrics import PredsmIoU  # noqa: F401
        from hbird.utils.image_transformations import CombTransforms  # noqa: F401
        from hbird.utils.io import list_files, read_file_set  # noqa: F401
        from hbird.utils.transforms import IMAGENET_STD, get_hbird_val_transforms  # noqa: F401
        from hbird.data import get_dataset  # noqa: F401
        from hbird.data.voc.voc_data import TrainXVOCValDataModule, VOCDataModule  # noqa: F401
        from hbird.data.voc.voc_tar_data import VOCDataModule as VOCDataModuleTar  # noqa: F401
        from hbird.data.ade20k.ade20k_data import Ade20kDataModule  # noqa: F401
        from hbird.data.cityscapes.cityscapes_tar_data import CityscapesDataModule  # noqa: F401
        from hbird.data.coco.coco_data import CocoDataModule  # noqa: F401

        # Reference parity detail: STD[2] keeps the 0.255 value by default.
        assert IMAGENET_STD[2] == 0.255
        from hbird_tpu.nn.search_exact import NearestNeighborSearchExact

        assert NearestNeighborSearchFaiss is NearestNeighborSearchExact


class TestBuildModelNegativePaths:
    """Error paths of build_model (r3 weak item: the preset surface was
    happy-path-only tested while its checkpoints can never load here)."""

    def _cfg(self, **kw):
        from hbird_tpu.eval_cli import RunConfig

        base = dict(
            dataset_name="voc", data_dir="/d", d_model=384, patch_size=16,
        )
        base.update(kw)
        return RunConfig(**base)

    def test_misspelled_preset_lists_available(self):
        from hbird_tpu.eval_cli import build_model

        with pytest.raises(RuntimeError, match="Unknown model preset"):
            build_model(self._cfg(model="dino_vitz16"))
        # the error must name real alternatives
        with pytest.raises(RuntimeError, match="dino_vits16"):
            build_model(self._cfg(model="dino_vitz16"))

    def test_unsupported_dinov2_size(self):
        from hbird_tpu.eval_cli import build_model

        with pytest.raises(RuntimeError, match="Unsupported --dinov2"):
            build_model(self._cfg(dinov2="vith14", d_model=1280))

    def test_no_model_specified(self):
        from hbird_tpu.eval_cli import build_model

        with pytest.raises(RuntimeError, match="No model specified"):
            build_model(self._cfg())

    def test_preset_without_checkpoint_or_random_init(self):
        from hbird_tpu.eval_cli import build_model

        with pytest.raises(RuntimeError, match="No --checkpoint"):
            build_model(self._cfg(model="dino_vits16"))

    @pytest.mark.slow  # ~10s: builds and converts a full checkpoint twice
    def test_checkpoint_shape_mismatch(self, tmp_path):
        torch = pytest.importorskip("torch")
        import numpy as np

        from hbird_tpu.eval_cli import build_model
        from hbird_tpu.models.vit import VIT_PRESETS, ViT

        # Write a real torch checkpoint of the WRONG geometry (patch 8
        # vs the preset's 16).
        import jax

        cfg8 = VIT_PRESETS["dino_vits8"]
        params = ViT(cfg8).init(jax.random.PRNGKey(0))
        sd = {
            "patch_embed.proj.weight": torch.zeros(384, 3, 8, 8),
            "patch_embed.proj.bias": torch.zeros(384),
            "cls_token": torch.zeros(1, 1, 384),
            "pos_embed": torch.zeros(1, 1 + 28 * 28, 384),
            "norm.weight": torch.ones(384),
            "norm.bias": torch.zeros(384),
        }
        for i in range(12):
            sd.update({
                f"blocks.{i}.norm1.weight": torch.ones(384),
                f"blocks.{i}.norm1.bias": torch.zeros(384),
                f"blocks.{i}.attn.qkv.weight": torch.zeros(1152, 384),
                f"blocks.{i}.attn.qkv.bias": torch.zeros(1152),
                f"blocks.{i}.attn.proj.weight": torch.zeros(384, 384),
                f"blocks.{i}.attn.proj.bias": torch.zeros(384),
                f"blocks.{i}.norm2.weight": torch.ones(384),
                f"blocks.{i}.norm2.bias": torch.zeros(384),
                f"blocks.{i}.mlp.fc1.weight": torch.zeros(1536, 384),
                f"blocks.{i}.mlp.fc1.bias": torch.zeros(1536),
                f"blocks.{i}.mlp.fc2.weight": torch.zeros(384, 1536),
                f"blocks.{i}.mlp.fc2.bias": torch.zeros(384),
            })
        path = str(tmp_path / "wrong.pth")
        torch.save(sd, path)
        del params
        with pytest.raises(RuntimeError, match="shape mismatch"):
            build_model(
                self._cfg(model="dino_vits16", checkpoint=path)
            )

    def test_checkpoint_load_carries_preset_interp_convention(self, tmp_path):
        """A dinov2 preset + matching checkpoint must keep the preset's
        hub interpolation convention (offset 0.1), not the converter's
        shape-inferred default."""
        torch = pytest.importorskip("torch")

        from hbird_tpu.eval_cli import build_model

        d, depth = 384, 12
        sd = {
            "patch_embed.proj.weight": torch.zeros(d, 3, 14, 14),
            "patch_embed.proj.bias": torch.zeros(d),
            "cls_token": torch.zeros(1, 1, d),
            "pos_embed": torch.zeros(1, 1 + 37 * 37, d),
            "norm.weight": torch.ones(d),
            "norm.bias": torch.zeros(d),
        }
        for i in range(depth):
            sd.update({
                f"blocks.{i}.norm1.weight": torch.ones(d),
                f"blocks.{i}.norm1.bias": torch.zeros(d),
                f"blocks.{i}.attn.qkv.weight": torch.zeros(3 * d, d),
                f"blocks.{i}.attn.qkv.bias": torch.zeros(3 * d),
                f"blocks.{i}.attn.proj.weight": torch.zeros(d, d),
                f"blocks.{i}.attn.proj.bias": torch.zeros(d),
                f"blocks.{i}.norm2.weight": torch.ones(d),
                f"blocks.{i}.norm2.bias": torch.zeros(d),
                f"blocks.{i}.ls1.gamma": torch.ones(d),
                f"blocks.{i}.ls2.gamma": torch.ones(d),
                f"blocks.{i}.mlp.fc1.weight": torch.zeros(4 * d, d),
                f"blocks.{i}.mlp.fc1.bias": torch.zeros(4 * d),
                f"blocks.{i}.mlp.fc2.weight": torch.zeros(d, 4 * d),
                f"blocks.{i}.mlp.fc2.bias": torch.zeros(d),
            })
        path = str(tmp_path / "dinov2s.pth")
        torch.save(sd, path)
        vit, params = build_model(
            self._cfg(dinov2="vits14", checkpoint=path)
        )
        assert vit.config.pos_interp_offset == 0.1
        assert vit.config.layerscale


class TestRuntimeFetch:
    """--runtime-fetch: the reference's turnkey torch.hub/timm runtime
    loading (eval.py:207-234), resolved to a live wrapped module."""

    def _cfg(self, **kw):
        from hbird_tpu.eval_cli import RunConfig

        base = dict(
            dataset_name="voc", data_dir="/d", d_model=8, patch_size=4,
            input_size=16, runtime_fetch=True,
        )
        base.update(kw)
        return RunConfig(**base)

    def test_dino_via_torch_hub(self, monkeypatch):
        torch = pytest.importorskip("torch")

        from hbird_tpu.eval_cli import build_model
        from hbird_tpu.models import FeatureExtractorSimple

        class FakeDino(torch.nn.Module):
            def get_intermediate_layers(self, x, n=1):
                b = x.shape[0]
                return [torch.zeros(b, 1 + 16, 8)]  # CLS + 4x4 patches

        calls = {}

        def fake_hub_load(repo, name, **kw):
            calls["repo"], calls["name"] = repo, name
            return FakeDino()

        monkeypatch.setattr(torch.hub, "load", fake_hub_load)
        fe = build_model(self._cfg(model="dino_vits16"))
        assert isinstance(fe, FeatureExtractorSimple)
        assert fe.jittable is False
        assert calls == {
            "repo": "facebookresearch/dino:main", "name": "dino_vits16"
        }
        import numpy as np

        feats, _ = fe.forward_features(
            np.zeros((2, 3, 16, 16), np.float32)
        )
        assert feats.shape == (2, 16, 8)  # CLS dropped

    def test_timm_fallback_for_unknown_names(self, monkeypatch):
        torch = pytest.importorskip("torch")
        import sys
        import types

        from hbird_tpu.eval_cli import build_model
        from hbird_tpu.models import FeatureExtractorSimple

        class FakeTimmViT(torch.nn.Module):
            def forward_features(self, x):
                return torch.zeros(x.shape[0], 1 + 16, 8)

        fake_timm = types.ModuleType("timm")
        created = {}

        def create_model(name, pretrained=False, **kw):
            created["name"], created["pretrained"] = name, pretrained
            return FakeTimmViT()

        fake_timm.create_model = create_model
        monkeypatch.setitem(sys.modules, "timm", fake_timm)
        fe = build_model(self._cfg(model="eva02_base_patch14_224"))
        assert isinstance(fe, FeatureExtractorSimple)
        assert created == {
            "name": "eva02_base_patch14_224", "pretrained": True
        }

    def test_checkpoint_beats_runtime_fetch(self):
        # An explicit checkpoint keeps the converted/jitted path even
        # with --runtime-fetch (the flag is the no-checkpoint fallback).
        from hbird_tpu.eval_cli import build_model

        with pytest.raises(RuntimeError, match="Unknown model preset"):
            # unknown preset + checkpoint: fails in the preset branch
            # (never tries hub/timm)
            build_model(
                self._cfg(model="not_a_preset", checkpoint="/nope.pth")
            )
