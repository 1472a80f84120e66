from hbird_tpu.utils.eval_metrics import PredsmIoU, confusion_matrix

__all__ = ["PredsmIoU", "confusion_matrix"]
