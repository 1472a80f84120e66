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
