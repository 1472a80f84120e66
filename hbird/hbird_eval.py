"""Compat re-export: reference `hbird.hbird_eval` -> hbird_tpu engine.

The reference module also exposes its imports at module level
(reference hbird_eval.py:30-40); user code does e.g.
`from hbird.hbird_eval import PredsmIoU` — keep those working.
"""

from hbird_tpu.hbird_eval import HbirdEvaluation, hbird_evaluation
from hbird_tpu.models.extractor import FeatureExtractor, FeatureExtractorSimple
from hbird_tpu.utils.eval_metrics import PredsmIoU
from hbird_tpu.data import get_dataset
from hbird_tpu.data.transforms import (
    CombTransforms,
    get_hbird_train_transforms,
    get_hbird_val_transforms,
)

__all__ = [
    "HbirdEvaluation",
    "hbird_evaluation",
    "FeatureExtractor",
    "FeatureExtractorSimple",
    "PredsmIoU",
    "get_dataset",
    "CombTransforms",
    "get_hbird_train_transforms",
    "get_hbird_val_transforms",
]
