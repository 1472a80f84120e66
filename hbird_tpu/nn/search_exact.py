"""Exact flat kNN backend on TPU HBM (replaces Faiss GpuIndexFlatIP/L2).

Feature parity with the reference Faiss backend
(hbird/nn/search_faiss.py:6-90):
- distance_measure: "dot_product" (default) | "l2"/"euclidean"
- `use_fp16` -> bf16 bank storage (the TPU half-precision analogue of
  faiss `config.useFloat16`, search_faiss.py:40); scores accumulate in f32
- `idx_shard=True` + a mesh -> rows sharded across the mesh's bank axis
  (IndexShards equivalent); `idx_shard=False` keeps the bank on one
  device / replicated (IndexReplicas equivalent — on TPU a replicated
  bank is just the degenerate 1-shard case since queries already batch)
- `gpu_ids` -> `devices` (optional explicit device list)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hbird_tpu.nn.search_base import NearestNeighborSearchBase
from hbird_tpu.parallel.mesh import make_mesh
from hbird_tpu.parallel.sharded_knn import shard_bank, sharded_knn_with_labels


class NearestNeighborSearchExact(NearestNeighborSearchBase):
    def __init__(
        self,
        feature_memory,
        n_neighbors: int = 30,
        distance_measure: str = "dot_product",
        idx_shard: bool = False,
        use_fp16: bool = False,
        use_int8: bool = False,
        quantization: Optional[str] = None,
        num_reordering_candidates: int = 0,
        devices=None,
        mesh=None,
        label_memory=None,
        query_block: Optional[int] = None,
        bank_block: Optional[int] = None,
        kernel: str = "auto",
        shard_strategy: str = "gather",
        valid_rows: Optional[int] = None,
        **kwargs,
    ):
        # Real row count when feature_memory arrives PRE-PADDED (the
        # engine's mesh-sharded device accumulation pads to even shards);
        # None = every row is real.
        self._injected_valid_rows = valid_rows
        # 'gather': replicated queries + per-shard top-k + all_gather merge.
        # 'ring': query-sharded ppermute ring (nothing replicated; see
        # parallel/sharded_knn.ring_knn_with_labels). Only meaningful with
        # a multi-device bank mesh.
        assert shard_strategy in ("gather", "ring"), shard_strategy
        self.shard_strategy = shard_strategy
        self.use_fp16 = use_fp16
        # quantization: explicit storage-scheme selector.
        #   'int8'      — global-scale symmetric int8 (alias of use_int8)
        #   'int8_rows' — PER-ROW-scale int8 (SQ8, the Faiss
        #                 ScalarQuantizer analogue / the cheap core of
        #                 ScaNN's score_ah): each bank row keeps its own
        #                 scale, dequantized in the kernel epilogue so
        #                 top-k ordering is over dequantized dots.
        #   'int8_asym' — int8_rows storage + ASYMMETRIC scoring (the
        #                 defining property of ScaNN's score_ah,
        #                 reference search_scann.py:29-30): queries stay
        #                 bf16, only the bank is quantized (the kernel
        #                 casts each int8 tile to bf16 ahead of the MXU
        #                 matmul), so shortlist error comes from bank
        #                 rounding alone. Same bank bytes/HBM traffic;
        #                 returned scores are approximate true dot
        #                 products directly (no query-scale factor).
        self.int8_asym = False
        if quantization is not None:
            qz = str(quantization).lower()
            if qz not in ("int8", "int8_rows", "int8_asym"):
                raise ValueError(
                    f"quantization must be 'int8', 'int8_rows' or "
                    f"'int8_asym': {quantization!r}"
                )
            use_int8 = True
            self.int8_rows = qz in ("int8_rows", "int8_asym")
            self.int8_asym = qz == "int8_asym"
        else:
            self.int8_rows = False
        self.use_int8 = use_int8
        # ScaNN-style exact re-ordering of quantized-scan candidates
        # (reference search_scann.py:32); only meaningful with use_int8.
        self.num_reordering_candidates = int(num_reordering_candidates)
        self.idx_shard = idx_shard
        self.devices = devices
        self.mesh = mesh
        self.label_memory = label_memory
        if kernel == "auto":
            # The fused kernel covers dot product AND expanded-norm l2
            # (Faiss GpuIndexFlatIP/L2 both map to it); only exotic
            # metrics fall back to the XLA blockwise path.
            kernel = (
                "pallas"
                if distance_measure.lower()
                in ("dot_product", "l2", "euclidean")
                else "xla"
            )
        if use_int8:
            # int8 is a property of the fused kernel's MXU path.
            assert distance_measure.lower() == "dot_product", (
                "use_int8 requires dot_product"
            )
            kernel = "pallas"
        self.kernel = kernel
        # Measured on v5e (bank 1.024M x 768, k=30): pallas 512/8192 is the
        # fastest variant; the XLA path prefers bigger query tiles.
        # Measured on v5e (1M bank, k=30, round 2): the carry merge at
        # block_q=256/block_m=8192 is the fastest pallas config
        # (59.6k q/s bf16 vs 52.0k for round 1's single/512).
        self.query_block = int(query_block or (256 if kernel == "pallas" else 1024))
        self.bank_block = int(bank_block or 8192)
        super().__init__(feature_memory, n_neighbors, distance_measure)

    # ------------------------------------------------------------------
    def _initialize_index(self):
        if self.mesh is None and self.idx_shard:
            devs = list(self.devices or jax.devices())
            if len(devs) > 1:
                self.mesh = make_mesh((len(devs),), ("bank",), devices=devs)
        return None

    def _add_features_to_index(self):
        if self.use_int8:
            store = jnp.int8
        else:
            store = jnp.bfloat16 if self.use_fp16 else jnp.float32
        self._bank_scale = None
        self._bank_row_scale = None
        self.rerank_bank = None
        if self.use_int8:
            # Symmetric int8 quantization. Global scale (default): int32
            # scores are a positive constant multiple of the quantized
            # dots, ordering preserved. Per-row scales (int8_rows): each
            # row i quantizes with s_i = max|b_i|/127 — rows with small
            # dynamic range keep ~7 bits of resolution instead of losing
            # them to the bank-wide max — and the kernel multiplies the
            # int32 scores by s_i in the epilogue.
            bank_f = (
                self.feature_memory.astype(jnp.float32)
                if isinstance(self.feature_memory, jax.Array)
                else jnp.asarray(np.asarray(self.feature_memory, np.float32))
            )
            if self.num_reordering_candidates > self.n_neighbors:
                # Full-precision copy for the exact re-ordering pass (bf16:
                # half the f32 footprint, exact enough for re-scoring).
                rb = bank_f.astype(jnp.bfloat16)
                if self.mesh is not None and self.mesh.shape.get("bank", 1) > 1:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    from hbird_tpu.parallel.sharded_knn import pad_rows_for_mesh

                    n_shards = self.mesh.shape["bank"]
                    padded = pad_rows_for_mesh(rb.shape[0], n_shards)
                    if padded != rb.shape[0]:
                        rb = jnp.pad(rb, ((0, padded - rb.shape[0]), (0, 0)))
                    rb = jax.device_put(rb, NamedSharding(self.mesh, P("bank")))
                self.rerank_bank = rb
            from hbird_tpu.ops.quantize import quantize_bank_int8

            self.feature_memory, scale = quantize_bank_int8(
                bank_f, per_row=self.int8_rows
            )
            if self.int8_rows:
                # (M, 1): 2-D so state_spec scales it with the row count.
                self._bank_row_scale = scale
            else:
                self._bank_scale = scale
        bank_in = self.feature_memory
        labels = self.label_memory
        if self.mesh is not None and self.mesh.shape.get("bank", 1) > 1:
            if isinstance(bank_in, jax.Array):
                # Device-resident bank (engine mesh accumulation or an
                # upstream jax computation): pad + place WITHOUT a host
                # round-trip — shard_bank's device path pads with jnp.pad
                # and resharding rides the ICI.
                if labels is None:
                    labels = jnp.zeros((bank_in.shape[0], 1), jnp.float32)
                self.bank, self.labels, self.valid_rows = shard_bank(
                    bank_in.astype(store),
                    labels.astype(jnp.float32)
                    if isinstance(labels, jax.Array)
                    else jnp.asarray(np.asarray(labels, np.float32)),
                    self.mesh,
                )
            else:
                bank = np.asarray(bank_in, dtype=np.float32)
                if labels is None:
                    labels = np.zeros((bank.shape[0], 1), np.float32)
                self.bank, self.labels, self.valid_rows = shard_bank(
                    bank.astype(store), np.asarray(labels, np.float32),
                    self.mesh,
                )
            if self._injected_valid_rows is not None:
                # Pre-padded input: shard_bank counted the padding as
                # real rows; mask it back out.
                self.valid_rows = int(self._injected_valid_rows)
            if self._bank_row_scale is not None:
                # Per-row dequant scales shard alongside the bank rows
                # (padding scales 0: padded rows score 0 and are masked
                # by valid_rows anyway).
                from jax.sharding import NamedSharding, PartitionSpec as P

                rs = self._bank_row_scale
                pad = self.bank.shape[0] - rs.shape[0]
                if pad:
                    rs = jnp.pad(rs, ((0, pad), (0, 0)))
                self._bank_row_scale = jax.device_put(
                    rs, NamedSharding(self.mesh, P("bank"))
                )
            return
        self.mesh = None
        if isinstance(bank_in, jax.Array):
            # Device-resident bank from the engine's on-device accumulation:
            # no host round-trip.
            self.bank = bank_in.astype(store)
        else:
            self.bank = jnp.asarray(np.asarray(bank_in, np.float32), dtype=store)
        if labels is None:
            labels = jnp.zeros((self.bank.shape[0], 1), jnp.float32)
        self.labels = (
            labels.astype(jnp.float32)
            if isinstance(labels, jax.Array)
            else jnp.asarray(np.asarray(labels, np.float32))
        )
        self.valid_rows = self.bank.shape[0]
        if self._injected_valid_rows is not None:
            # Engine banks arrive PRE-PADDED even when the mesh has no
            # bank axis (or a size-1 one) — pad_rows_for_mesh block-
            # aligns the accumulator regardless. Without this mask the
            # kernel scores the zero padding rows as real (score-0 ghost
            # neighbours with all-zero labels).
            self.valid_rows = int(self._injected_valid_rows)

    # ------------------------------------------------------------------
    @property
    def device_state(self):
        """Large device arrays as a pytree, so the engine can pass them as
        jit ARGUMENTS (closed-over multi-GB banks would be serialized into
        the compiled program as constants)."""
        state = {"bank": self.bank, "labels": self.labels}
        if self.rerank_bank is not None:
            state["rerank_bank"] = self.rerank_bank
        if self._bank_row_scale is not None:
            # (M, 1) per-row dequant scales: VALUE state like bank_scale
            # (and 2-D, so state_spec scales it with the row count for
            # AOT compilation against abstract specs).
            state["bank_row_scale"] = self._bank_row_scale
        if self._bank_scale is not None:
            # The int8 quantization scale is VALUE state, not config: it
            # must travel through the state pytree (a closed-over scalar
            # would be baked into the compiled program as a constant,
            # breaking AOT compilation against abstract state specs).
            state["bank_scale"] = self._bank_scale
        return state

    def search_with_labels(
        self, q: jax.Array, k: Optional[int] = None
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Device-resident fused search: (values, global indices, labels)."""
        return self.search_with_labels_pure(self.device_state, q, k)

    def search_with_labels_pure(
        self, state, q: jax.Array, k: Optional[int] = None
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Pure variant over an explicit state pytree (jit-argument safe).

        Traceable under jit — the engine calls this inside the fused eval
        step with `state=self.device_state` threaded through as arguments.
        """
        bank = state["bank"]
        labels = state["labels"]
        rerank_bank = state.get("rerank_bank")
        bank_scale = state.get("bank_scale", self._bank_scale)
        row_scale = state.get("bank_row_scale")
        k = k or self.n_neighbors
        rerank = self.use_int8 and rerank_bank is not None
        if self.use_int8:
            if self.int8_asym:
                # Asymmetric: bf16 queries against the int8 bank — the
                # kernel casts each bank tile; row_scale dequantizes in
                # the epilogue, so values come out in true dot units.
                q_cast = q.astype(jnp.bfloat16)
                q_scale = None
            else:
                from hbird_tpu.ops.quantize import quantize_queries_int8

                q_cast, q_scale = quantize_queries_int8(q)
        else:
            q_cast = q.astype(bank.dtype)
        if (
            self.shard_strategy == "ring"
            and self.mesh is not None
            and self.mesh.shape.get("bank", 1) > 1
        ):
            from hbird_tpu.parallel.sharded_knn import ring_knn_with_labels

            # Split queries over EVERY mesh axis: the default ('bank',)
            # alone would leave each data row redundantly running the
            # identical full ring (n_data x the compute and query HBM).
            parts = tuple(
                ax for ax in ("data", "bank")
                if self.mesh.shape.get(ax, 1) > 1
            )
            vals, idx, out_labels = ring_knn_with_labels(
                q_cast,
                bank,
                labels,
                k,
                mesh=self.mesh,
                valid_rows=self.valid_rows,
                distance=self.distance_measure,
                query_partition=parts,
                query_block=self.query_block,
                bank_block=self.bank_block,
                kernel=self.kernel,
                rerank_bank=rerank_bank if rerank else None,
                rerank_queries=q.astype(jnp.bfloat16) if rerank else None,
                rerank_candidates=self.num_reordering_candidates if rerank else 0,
                row_scale=row_scale,
            )
            if self.use_int8 and not rerank and not self.int8_asym:
                # Row-scaled scores already carry the bank-side scale
                # (asym scores carry BOTH sides — bf16 queries).
                vals = vals * (
                    q_scale if row_scale is not None
                    else bank_scale * q_scale
                )
            return vals, idx, out_labels
        vals, idx, out_labels = sharded_knn_with_labels(
            q_cast,
            bank,
            labels,
            k,
            mesh=self.mesh,
            valid_rows=self.valid_rows,
            distance=self.distance_measure,
            query_block=self.query_block,
            bank_block=self.bank_block,
            kernel=self.kernel,
            rerank_bank=rerank_bank if rerank else None,
            rerank_queries=q.astype(jnp.bfloat16) if rerank else None,
            rerank_candidates=self.num_reordering_candidates if rerank else 0,
            row_scale=row_scale,
        )
        if self.use_int8 and not rerank and not self.int8_asym:
            # Rescale int32 scores back to (approximate) dot products so
            # downstream cross-attention temperatures stay calibrated.
            # (Reranked scores are already exact bf16 dot products; row-
            # scaled scores already carry the bank-side scale; asym
            # scores carry both sides — bf16 queries.)
            vals = vals * (
                q_scale if row_scale is not None else bank_scale * q_scale
            )
        return vals, idx, out_labels

    def find_nearest_neighbors(
        self, q, k: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        k = k or self.n_neighbors
        vals, idx, _ = self.search_with_labels(jnp.asarray(np.asarray(q)), k)
        return np.asarray(idx), np.asarray(vals)
