from hbird_tpu.models.vit import ViTConfig, ViT, VIT_PRESETS
from hbird_tpu.models.extractor import (
    FeatureExtractor,
    FeatureExtractorSimple,
    default_ftr_extr_fn,
    normalize_minmax,
)


def wrap_torch_backbone(*args, **kwargs):
    """Lazy re-export (hbird_tpu.models.torch_adapter): keeps torch out of
    import-time for the pure-JAX paths."""
    from hbird_tpu.models.torch_adapter import wrap_torch_backbone as _w

    return _w(*args, **kwargs)


__all__ = [
    "ViTConfig",
    "ViT",
    "VIT_PRESETS",
    "FeatureExtractor",
    "FeatureExtractorSimple",
    "default_ftr_extr_fn",
    "normalize_minmax",
    "wrap_torch_backbone",
]
