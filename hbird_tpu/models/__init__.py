from hbird_tpu.models.vit import ViTConfig, ViT, VIT_PRESETS
from hbird_tpu.models.extractor import (
    FeatureExtractor,
    FeatureExtractorSimple,
    default_ftr_extr_fn,
    normalize_minmax,
)

__all__ = [
    "ViTConfig",
    "ViT",
    "VIT_PRESETS",
    "FeatureExtractor",
    "FeatureExtractorSimple",
    "default_ftr_extr_fn",
    "normalize_minmax",
]
