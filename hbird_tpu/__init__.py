"""hbird_tpu — TPU-native Hummingbird / dense-NN-retrieval evaluation framework.

A from-scratch JAX/XLA/Pallas implementation of the "Hummingbird" in-context
scene-understanding evaluation (Balažević et al., NeurIPS 2023), with the same
capabilities as the reference `open-hummingbird-eval` toolkit
(reference: /root/reference, hbird/hbird_eval.py:1-9) but designed TPU-first:

- frozen ViT patch features extracted with jitted pure-JAX backbones,
- a device-resident, mesh-sharded memory bank of L2-normalized patch
  embeddings + per-patch soft labels,
- exact k-nearest-neighbour retrieval as a tiled matmul + streaming top-k
  (Pallas kernel / blockwise XLA), sharded over the mesh with an
  all_gather merge — replacing Faiss-GPU / ScaNN,
- on-device soft-label cross-attention transfer and confusion-matrix mIoU.

Public API mirrors the reference's `hbird_evaluation` entry point
(reference hbird/hbird_eval.py:640-722).
"""

from hbird_tpu.version import __version__

__all__ = ["HbirdEvaluation", "hbird_evaluation", "__version__"]


def __getattr__(name):  # PEP 562 lazy import: keeps `import hbird_tpu` light
    if name in ("HbirdEvaluation", "hbird_evaluation"):
        from hbird_tpu import hbird_eval

        return getattr(hbird_eval, name)
    raise AttributeError(f"module 'hbird_tpu' has no attribute {name!r}")
