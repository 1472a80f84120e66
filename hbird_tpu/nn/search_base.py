"""Nearest-neighbour backend contract.

Same ABC shape as the reference (hbird/nn/search_base.py:3-31):
construction takes the feature memory; `find_nearest_neighbors(q, k)`
returns (indices, distances) as numpy arrays. TPU backends additionally
expose `search_with_labels` — the fused device-resident path the engine
uses (scores + neighbour labels without leaving the device).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Optional, Tuple

import numpy as np


class NearestNeighborSearchBase(ABC):
    def __init__(
        self,
        feature_memory,
        n_neighbors: int = 30,
        distance_measure: str = "dot_product",
        **kwargs,
    ):
        self.feature_memory = feature_memory
        self.n_neighbors = n_neighbors
        self.distance_measure = distance_measure.lower()
        self.index = self._initialize_index()
        self._add_features_to_index()

    @abstractmethod
    def _initialize_index(self):
        """Initialize the search index/state."""

    @abstractmethod
    def _add_features_to_index(self):
        """Place the feature memory on device(s)."""

    @abstractmethod
    def find_nearest_neighbors(
        self, q, k: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Return (indices, distances) for queries q — numpy, like the
        reference backends (search_faiss.py:83-90)."""

    def pin_expected_rows(self, n_rows: int) -> None:
        """Re-pin row-count-dependent STATIC config (valid-row masking,
        tree geometry) to `n_rows`. Used on AOT dummy backends so the
        traced program matches the real bank's (hbird_eval._start_aot_eval)."""
        self.valid_rows = int(n_rows)

    def gather_features_pure(self, state, idx):
        """Gather stored feature rows by ORIGINAL row id from the state
        pytree (backends with a reordered layout override this).

        Quantized banks return DEQUANTIZED features: prefer the
        full-precision rerank copy when present, else rescale int8 codes
        by the stored bank_scale — raw codes (~|127|) are not features.
        """
        import jax.numpy as jnp

        src = state.get("rerank_bank", state["bank"])
        rows = jnp.take(src, idx, axis=0)
        if rows.dtype == jnp.int8 and "bank_row_scale" in state:
            # Per-row scales (int8_rows): gather each neighbour's own
            # scale alongside its codes.
            rows = rows.astype(jnp.float32) * jnp.take(
                state["bank_row_scale"], idx, axis=0
            )
            if "bank_col_scale" in state:
                # Separable score_ah dequantization: x = codes * s_row
                # * c_col (col scales only exist on the per-row modes).
                rows = rows * state["bank_col_scale"]
        elif rows.dtype == jnp.int8 and "bank_scale" in state:
            rows = rows.astype(jnp.float32) * state["bank_scale"]
        return rows

    def state_spec(self, n_rows: int):
        """`jax.ShapeDtypeStruct` pytree of `device_state` as it would look
        with an `n_rows`-row bank (2-D arrays scale with the row count,
        scalars keep their shape).

        Lets the engine AOT-compile the fused eval step on a dummy-config
        backend before the real bank exists — the compiled program is
        valid for any state with these avals, because
        `search_with_labels_pure` reads all value-dependent quantities
        (bank, labels, quantization scale) from the state argument.
        """
        import jax

        def spec(x):
            shape = ((n_rows,) + x.shape[1:]) if x.ndim >= 2 else x.shape
            return jax.ShapeDtypeStruct(shape, x.dtype)

        return jax.tree.map(spec, self.device_state)
