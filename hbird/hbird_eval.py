"""Compat re-export: reference `hbird.hbird_eval` -> hbird_tpu engine."""

from hbird_tpu.hbird_eval import HbirdEvaluation, hbird_evaluation

__all__ = ["HbirdEvaluation", "hbird_evaluation"]
