"""Device-mesh construction helpers.

The framework scales along two axes:
- 'data': batches of images (data parallelism for the ViT forward and
  confusion-matrix accumulation — making the reference's dormant DDP
  all_reduce hook real, reference hbird/utils/eval_metrics.py:250-252),
- 'bank': memory-bank rows (the TPU equivalent of Faiss IndexShards
  multi-GPU sharding, reference hbird/nn/search_faiss.py:53-63).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: Sequence[int],
    axis_names: Sequence[str] = ("data", "bank"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh with the given per-axis sizes over available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = int(np.prod(axis_sizes))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(tuple(axis_sizes))
    return Mesh(dev_array, tuple(axis_names))


def default_mesh(
    n_devices: Optional[int] = None, bank_axis_size: Optional[int] = None
) -> Mesh:
    """1D or 2D mesh over the first n devices.

    With `bank_axis_size` given, builds ('data', 'bank') 2D; otherwise a 1D
    ('bank',) mesh — bank sharding is the capacity axis that lets >HBM-size
    memory banks fit (SURVEY §5: 10.24M x 768 fp32 ≈ 31 GB needs ≥2 chips).
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    if bank_axis_size:
        assert n % bank_axis_size == 0
        return make_mesh((n // bank_axis_size, bank_axis_size), ("data", "bank"))
    return make_mesh((n,), ("bank",))
