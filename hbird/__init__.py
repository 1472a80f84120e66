"""Drop-in import-compatibility layer over hbird_tpu.

Users of the reference toolkit import `from hbird.hbird_eval import
hbird_evaluation`, `from hbird.utils.eval_metrics import PredsmIoU`, etc.
This thin package re-exports the hbird_tpu equivalents under the same
module paths so existing scripts keep working on TPU unchanged.
"""
