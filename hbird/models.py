"""Compat re-export: reference `hbird.models` -> hbird_tpu extractors."""

from hbird_tpu.models.extractor import (
    FeatureExtractor,
    FeatureExtractorSimple,
    default_ftr_extr_fn,
    normalize_minmax,
)

_normalize_minmax = normalize_minmax  # reference-private name

__all__ = ["FeatureExtractor", "FeatureExtractorSimple", "default_ftr_extr_fn"]
