from hbird_tpu.core.patchify import patchify_gt, patch_soft_labels
from hbird_tpu.core.attention import cross_attention, cross_attention_from_scores
from hbird_tpu.core.sampling import patch_sampling_scores, sample_patches

__all__ = [
    "patchify_gt",
    "patch_soft_labels",
    "cross_attention",
    "cross_attention_from_scores",
    "patch_sampling_scores",
    "sample_patches",
]
