from hbird_tpu.models.vit import ViTConfig, ViT, VIT_PRESETS
from hbird_tpu.models.extractor import FeatureExtractor, FeatureExtractorSimple

__all__ = [
    "ViTConfig",
    "ViT",
    "VIT_PRESETS",
    "FeatureExtractor",
    "FeatureExtractorSimple",
]
