"""Approximate kNN backend (the TPU-native ScaNN equivalent).

The reference's ScaNN backend prunes work with a k-means tree +
asymmetric hashing + exact reordering (hbird/nn/search_scann.py:18-33).
This backend accepts ScaNN's parameter names for drop-in config
compatibility. Two modes:

- **flat (default)**: measured on v5e, every approximate full-scan
  variant is DOMINATED by the fused exact Pallas kernel (59.6k q/s
  recall 1.0 vs approx_max_k 21.7k @0.9998 and ScaNN-literal
  reorder(120) 5.0k @0.9948 — scripts/bench_backends.py), so
  dot-product searches route straight to it; `lax.approx_max_k` (the
  TPU PartialReduce primitive) remains the path for other metrics.
- **tree (use_tree=True / nn_method='ivf')**: real
  tree(num_leaves, num_leaves_to_search) semantics — the approximation
  that actually pays on TPU (ops/ivf.py; 152.6k q/s at recall ~1.0 on a
  1M clustered bank after capacity-aware refinement).

- anisotropic_quantization_threshold / dimensions_per_block: real on the
  per-row int8 modes (quantization='int8_rows'/'int8_asym'):
  dimensions_per_block selects per-column-BLOCK scales (separable with
  the row scales — dequantization is codes * s_row * c_col, recovered
  exactly by pre-scaling queries with c_col, kernels untouched), and the
  threshold drives score-aware CODE refinement minimizing the
  anisotropic loss (ops/quantize.py::quantize_codes_aniso). With bf16
  storage (the default) they have nothing to act on and warn once.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hbird_tpu.nn.search_base import NearestNeighborSearchBase
from hbird_tpu.parallel.sharded_knn import sharded_knn_with_labels


def _round_up_rows(n_rows: int, mesh) -> int:
    """Rows padded to a multiple of the mesh's bank axis (shard_rows)."""
    p = mesh.shape.get("bank", 1)
    return -(-n_rows // p) * p


class NearestNeighborSearchApprox(NearestNeighborSearchBase):
    def __init__(
        self,
        feature_memory,
        n_neighbors: int = 30,
        distance_measure: str = "dot_product",
        num_leaves: int = 512,
        num_leaves_to_search: int = 32,
        anisotropic_quantization_threshold: Optional[float] = None,
        num_reordering_candidates: int = 0,
        dimensions_per_block: Optional[int] = None,
        recall_target: Optional[float] = None,
        use_fp16: bool = True,
        use_tree: bool = False,
        use_int8: bool = False,
        quantization: Optional[str] = None,
        bank_scale: Optional[float] = None,
        tree_slack: float = 1.3,
        probe_mode: str = "auto",
        shard_probe: str = "split",
        tree_build_layout: str = "host",
        full_lloyd_iters: int = 0,
        tree_refine_rounds: int = 2,
        tree_sample_rows: int = 131072,
        kmeans_iters: int = 12,
        mesh=None,
        label_memory=None,
        query_block: Optional[int] = None,
        bank_block: int = 8192,
        seed: int = 0,
        valid_rows: Optional[int] = None,
        **kwargs,
    ):
        # Real row count when feature_memory arrives PRE-PADDED (the
        # engine's mesh-sharded device accumulation pads to even shards);
        # None = every row is real.
        self._injected_valid_rows = valid_rows
        if distance_measure not in ("dot_product", "euclidean", "l2"):
            raise ValueError(f"Unsupported distance measure: {distance_measure}")
        # ScaNN's literal tree() param name (reference search_scann.py:27
        # passes training_sample_size=bank_rows): alias of tree_sample_rows.
        if "training_sample_size" in kwargs:
            tree_sample_rows = int(kwargs.pop("training_sample_size"))
        # ScaNN's score_ah knobs (reference search_scann.py:29-30) act on
        # the per-row int8 modes: dimensions_per_block -> per-column-block
        # scales (separable with the row scales, folded into the queries
        # at search time), anisotropic_quantization_threshold -> score-
        # aware per-row scale selection (ops/quantize.py). With no int8
        # storage selected they have nothing to act on — warn, don't
        # silently drop an explicit setting.
        knobs_set = (
            anisotropic_quantization_threshold is not None
            or dimensions_per_block is not None
        )
        if knobs_set and quantization not in ("int8_rows", "int8_asym"):
            from hbird_tpu.utils.logging import get_logger

            get_logger(__name__).warning(
                "anisotropic_quantization_threshold/dimensions_per_block "
                "act on the per-row int8 modes (pass "
                "quantization='int8_rows' or 'int8_asym'); with %s bank "
                "storage they are ignored.",
                quantization or ("bf16" if use_fp16 else "f32"),
            )
        self.dims_per_block = None
        self.aniso_threshold = None
        if knobs_set and quantization in ("int8_rows", "int8_asym"):
            if dimensions_per_block is not None:
                self.dims_per_block = int(dimensions_per_block)
                if self.dims_per_block < 1:
                    raise ValueError(
                        f"dimensions_per_block must be >= 1: "
                        f"{dimensions_per_block}"
                    )
            if anisotropic_quantization_threshold is not None:
                self.aniso_threshold = float(
                    anisotropic_quantization_threshold
                )
                if not (0.0 < self.aniso_threshold < 1.0):
                    raise ValueError(
                        "anisotropic_quantization_threshold must be in "
                        f"(0, 1): {anisotropic_quantization_threshold}"
                    )
        # quantization: explicit int8 storage selector (same contract as
        # the exact backend): 'int8' = global scale, 'int8_rows' = per-
        # row scales (SQ8 — the honest core of ScaNN's score_ah:
        # ordering over DEQUANTIZED dots, per-row resolution kept),
        # 'int8_asym' = int8_rows storage + ASYMMETRIC scoring (bf16
        # queries against the int8 bank — score_ah's defining property:
        # shortlist error from bank rounding alone).
        self.int8_rows = False
        self.int8_asym = False
        if quantization is not None:
            qz = str(quantization).lower()
            if qz not in ("int8", "int8_rows", "int8_asym"):
                raise ValueError(
                    f"quantization must be 'int8', 'int8_rows' or "
                    f"'int8_asym': {quantization!r}"
                )
            if distance_measure != "dot_product":
                raise ValueError(
                    "int8 quantization requires dot_product scoring"
                )
            use_int8 = True
            self.int8_rows = qz in ("int8_rows", "int8_asym")
            self.int8_asym = qz == "int8_asym"
        recall_target_explicit = recall_target is not None
        if recall_target is None:
            frac = num_leaves_to_search / max(1, num_leaves)
            recall_target = float(np.clip(0.9 + 0.4 * frac, 0.5, 0.99))
        self.recall_target = recall_target
        self.num_leaves = num_leaves
        self.num_leaves_to_search = num_leaves_to_search
        self.num_reordering_candidates = num_reordering_candidates
        if (
            not use_tree
            and not use_int8
            and distance_measure == "dot_product"
            and (num_reordering_candidates > 0 or recall_target_explicit)
        ):
            from hbird_tpu.utils.logging import get_logger

            # The flat full-precision dot path routes to the exact fused
            # kernel (faster than every approximate full scan measured on
            # v5e), which makes these tuning knobs inert — say so rather
            # than silently ignoring explicitly-passed parameters. (A
            # quantized flat scan — use_int8 — is approximate and DOES
            # honor num_reordering_candidates, so no warning there.)
            get_logger(__name__).info(
                "Flat dot-product 'scann' routes to the exact kernel "
                "(recall 1.0); num_reordering_candidates/recall_target "
                "are bypassed. Pass use_tree=true (or nn_method='ivf') "
                "for real tree(num_leaves, num_leaves_to_search) pruning."
            )
        self.use_fp16 = use_fp16
        # use_tree=True: REAL tree(num_leaves, num_leaves_to_search)
        # semantics (reference search_scann.py:26-27) — k-means leaves,
        # capacity-balanced leaf layout, probed-leaf scan (ops/ivf.py);
        # with a bank mesh the leaf slabs shard across it
        # (parallel/sharded_ivf.py). Requires dot_product. Default off:
        # the exact/PartialReduce full scans win below ~1M rows; the tree
        # wins 2.8-3.5x at 1M-4M+ when recall ~0.95 is acceptable.
        self.use_tree = bool(use_tree) and distance_measure == "dot_product"
        if use_tree and not self.use_tree:
            from hbird_tpu.utils.logging import get_logger

            get_logger(__name__).warning(
                "use_tree requires dot_product scoring; falling back to "
                "the flat approximate scan (num_leaves/num_leaves_to_search "
                "map onto a recall target instead)."
            )
        # int8 scan (tree leaf slabs, or the flat fused path): symmetric
        # quantization, same schemes as the exact backend's
        # use_int8/quantization. Pass `bank_scale` when injecting a
        # pre-quantized int8 bank. Flat int8 requires dot_product (the
        # flat dot path routes to the fused exact kernel).
        self.use_int8 = bool(use_int8) and (
            self.use_tree or distance_measure == "dot_product"
        )
        self._bank_scale = (
            jnp.float32(bank_scale) if bank_scale is not None else None
        )
        self._bank_row_scale = None
        self._bank_col_scale = None
        self.tree_slack = float(tree_slack)
        # Tree probing granularity (ops/ivf.ivf_search): 'auto' keeps the
        # fast tile shortlist for leaf-coherent query sets (the engine's)
        # and switches to true per-query probing — ScaNN's per-query
        # leaves_to_search semantics — when a concrete query set's tile
        # coherence would dilute recall (measured 0.538 at 2048 iid
        # queries under tile probing).
        assert probe_mode in ("auto", "tile", "query"), probe_mode
        self.probe_mode = str(probe_mode)
        if (
            self.probe_mode == "query"
            and mesh is not None
            and mesh.shape.get("bank", 1) > 1
        ):
            # The sharded tree path probes per tile inside shard_map;
            # honoring 'query' there would need host-side grouping across
            # shards. Downgrade loudly rather than silently ignoring it.
            from hbird_tpu.utils.logging import get_logger

            get_logger(__name__).warning(
                "probe_mode='query' is a single-chip feature; a "
                "bank-sharded tree probes per query TILE. Using 'tile'."
            )
            self.probe_mode = "tile"
        # Per-query probing is host-orchestrated (leaf grouping on
        # concrete arrays) and cannot run under jit; the engine checks
        # this flag and runs its eval step eagerly (the same escape hatch
        # non-jittable torch backbones use). 'auto' stays jittable: under
        # a tracer it resolves to tile probing, which is exactly right
        # for the engine's leaf-coherent dense query tiles.
        self.jittable = not (self.use_tree and self.probe_mode == "query")
        # Meshed-tree probe semantics (parallel/sharded_ivf.py): 'split'
        # spreads the n_probe budget across shards (constant total scan,
        # recall can dip vs single-chip under leaf skew); 'full' probes
        # up to n_probe leaves PER shard (recall >= single-chip, up to p×
        # the scan). nn-param shard_probe=full selects the latter.
        self.shard_probe = str(shard_probe)
        # Meshed-tree builds only: where the capacity-balanced slot
        # placement runs. 'host' (default) replicates the (M, A)
        # choices/scores to every process and runs the greedy there —
        # bit-identical to the single-device build, O(M) host memory.
        # 'device' keeps everything mesh-sharded (binary threshold
        # search + perm-carrying scatter ring): same leaf MEMBERSHIP on
        # tie-free scores, nothing O(M) on any host — the >100M-row
        # path. nn-param tree_build_layout=device selects it.
        self.tree_build_layout = str(tree_build_layout)
        # Meshed-tree builds only: extra Lloyd iterations over the FULL
        # row-sharded bank (psum k-means, sharded_ivf.sharded_kmeans)
        # after the sample training — 0 keeps centroid parity with the
        # single-device (sample-trained) build.
        self.full_lloyd_iters = int(full_lloyd_iters)
        self.tree_refine_rounds = int(tree_refine_rounds)
        self.tree_sample_rows = int(tree_sample_rows)
        self.kmeans_iters = int(kmeans_iters)
        self.seed = int(seed)
        self.mesh = mesh
        self.label_memory = label_memory
        # 256 = the fused kernel's best tile (tree shortlists also stay
        # coherent at 256); the XLA approx path (non-dot metrics) prefers
        # bigger tiles.
        self.query_block = int(query_block or (
            256 if (self.use_tree or distance_measure == "dot_product")
            else 1024
        ))
        self.bank_block = int(bank_block)
        super().__init__(feature_memory, n_neighbors, distance_measure)

    def _initialize_index(self):
        return None

    def _quantize_bank(self, bank_f, *, row_block: Optional[int] = 262144):
        """int8-quantize a float bank per the configured scheme.

        Returns ``(codes, scale)`` — per-row ``(M, 1)`` or global scalar.
        When the score_ah knobs are active (per-row modes only) this
        routes through the separable per-row × per-column-block +
        anisotropic quantizer and records the column scales on the
        instance (``_bank_col_scale``; queries are pre-scaled by them at
        search time)."""
        from hbird_tpu.ops.quantize import (
            quantize_bank_int8, quantize_bank_int8_ah,
        )

        if self.int8_rows and (
            self.dims_per_block is not None or self.aniso_threshold is not None
        ):
            codes, scale, col = quantize_bank_int8_ah(
                bank_f,
                dims_per_block=self.dims_per_block,
                aniso_threshold=self.aniso_threshold,
                row_block=row_block,
            )
            self._bank_col_scale = col
            return codes, scale
        return quantize_bank_int8(bank_f, per_row=self.int8_rows)

    def _tree_geometry(self, n_rows: int):
        from hbird_tpu.ops.ivf import tree_layout

        n_leaves, cap = tree_layout(
            n_rows, self.num_leaves, slack=self.tree_slack
        )
        p = self.mesh.shape.get("bank", 1) if self.mesh is not None else 1
        if p > 1:
            # Slab boundaries must align with shard boundaries.
            n_leaves = ((n_leaves + p - 1) // p) * p
        return n_leaves, cap

    def _build_tree(self, bank_in, labels, store):
        """Leaf-partition the bank: train centroids, balance rows into
        fixed-capacity leaves, scatter into the leaf-contiguous layout."""
        from hbird_tpu.ops.ivf import (
            assign_leaves,
            balanced_layout,
            build_ivf_arrays,
            train_centroids,
        )

        if (
            self._injected_valid_rows is not None
            and self._injected_valid_rows < bank_in.shape[0]
        ):
            # Engine banks arrive PRE-PADDED (pad_rows_for_mesh block-
            # aligns the accumulator even without a >1 bank axis);
            # clustering the zero padding rows into leaves would count
            # them in leaf_valid and surface them as score-0 ghost
            # neighbours with all-zero labels.
            bank_in = bank_in[: self._injected_valid_rows]
            if labels is not None:
                labels = labels[: self._injected_valid_rows]

        row_scale_flat = None
        if self.use_int8:
            store = jnp.int8
            if isinstance(bank_in, jax.Array) and bank_in.dtype == jnp.int8:
                # Pre-quantized injection: bank_scale must be provided.
                assert self._bank_scale is not None, (
                    "int8 bank injection requires bank_scale"
                )
                assert not self.int8_rows, (
                    "pre-quantized int8 injection is global-scale only"
                )
                bank_s = bank_in
            else:
                bank_f = (
                    bank_in.astype(jnp.float32)
                    if isinstance(bank_in, jax.Array)
                    else jnp.asarray(np.asarray(bank_in, np.float32))
                )
                bank_s, scale = self._quantize_bank(bank_f)
                if self.int8_rows:
                    row_scale_flat = scale
                else:
                    self._bank_scale = scale
                del bank_f
        else:
            # Store dtype straight away — a full f32 copy of a multi-GB
            # bank would double HBM (and kill large single-chip paths).
            bank_s = (
                bank_in.astype(store)
                if isinstance(bank_in, jax.Array)
                else jnp.asarray(np.asarray(bank_in, np.float32), store)
            )
        m = bank_s.shape[0]
        n_leaves, cap = self._tree_geometry(m)
        self._n_leaves, self._cap = n_leaves, cap
        rng = np.random.default_rng(self.seed)
        n_sample = min(m, self.tree_sample_rows)
        sample = bank_s[
            jnp.asarray(rng.choice(m, n_sample, replace=False))
        ].astype(jnp.float32)
        self.centroids = train_centroids(
            sample, n_leaves, iters=self.kmeans_iters,
            key=jax.random.PRNGKey(self.seed),
        )
        if self.full_lloyd_iters > 0:
            # Full-bank Lloyd upgrade over the sample training (blockwise;
            # the sharded path's psum twin lives in sharded_kmeans). Runs
            # BEFORE the capacity refinement for the same reason as there.
            from hbird_tpu.ops.ivf import full_bank_lloyd

            self.centroids = full_bank_lloyd(
                bank_s, self.centroids, iters=self.full_lloyd_iters
            )
        if self.tree_refine_rounds > 0:
            from hbird_tpu.ops.ivf import refine_centroids_balanced

            self.centroids = refine_centroids_balanced(
                sample, self.centroids, slack=self.tree_slack,
                rounds=self.tree_refine_rounds,
            )
        choices, ch_scores = assign_leaves(
            bank_s, self.centroids, n_choices=3, return_scores=True
        )
        slots, fill = balanced_layout(choices, n_leaves, cap,
                                      scores=ch_scores)
        if labels is None:
            labels = jnp.zeros((m, 1), jnp.float32)
        self.bank, self.labels, self.perm = build_ivf_arrays(
            bank_s, labels, slots, n_leaves, cap
        )
        if row_scale_flat is not None:
            # Scatter the per-row scales into the same slab layout as
            # their rows (empty slots keep scale 0 — leaf_valid masks
            # them before they can score).
            n_slots = n_leaves * cap
            ivf_scale = jnp.zeros((n_slots, 1), jnp.float32)
            self._bank_row_scale = ivf_scale.at[
                jnp.asarray(slots, jnp.int32)
            ].set(row_scale_flat)
        # orig row -> leaf slot (for knn-details feature gathers by
        # original id) and per-leaf valid-row counts.
        self.slots = jnp.asarray(slots, jnp.int32)
        self.leaf_valid = jnp.asarray(fill, jnp.int32)
        self.valid_rows = m

    def _build_tree_sharded(self, bank_in, labels, store):
        """Distributed tree build (mesh bank axis > 1): the bank is
        row-sharded over the mesh BEFORE any tree work and never
        materializes on one device — shard-local assignment, the same
        host greedy layout as the single-device build (slot placement
        bit-identical), and a ppermute ring scatter into the leaf slabs
        (parallel/sharded_ivf.build_ivf_sharded)."""
        from hbird_tpu.ops.ivf import (
            refine_centroids_balanced, train_centroids,
        )
        from hbird_tpu.parallel.sharded_ivf import (
            build_ivf_sharded, shard_rows,
        )

        mesh = self.mesh
        row_scale_sharded = None
        if self.use_int8:
            store = jnp.int8
            if isinstance(bank_in, jax.Array) and bank_in.dtype == jnp.int8:
                assert self._bank_scale is not None, (
                    "int8 bank injection requires bank_scale"
                )
                assert not self.int8_rows, (
                    "pre-quantized int8 injection is global-scale only"
                )
                bank_s, m = shard_rows(bank_in, mesh)
                if self._injected_valid_rows is not None:
                    m = int(self._injected_valid_rows)
            else:
                bank_f, m = shard_rows(
                    bank_in
                    if isinstance(bank_in, jax.Array)
                    else np.asarray(bank_in, np.float32),
                    mesh,
                )
                if self._injected_valid_rows is not None:
                    m = int(self._injected_valid_rows)
                bank_f = bank_f.astype(jnp.float32)
                # row_block=None: slicing a row-sharded bank would gather
                # across shards; each shard only holds M/p rows anyway.
                bank_s, scale = self._quantize_bank(bank_f, row_block=None)
                if self.int8_rows:
                    # Per-row scales, row-sharded like the bank; they
                    # ride the ring scatter as an extra label column so
                    # each row's scale lands in its leaf slot.
                    row_scale_sharded = scale
                else:
                    # Global abs-max over the sharded rows -> replicated
                    # scalar.
                    self._bank_scale = scale
                del bank_f
        else:
            bank_s, m = shard_rows(
                bank_in
                if isinstance(bank_in, jax.Array)
                else np.asarray(bank_in, np.float32),
                mesh,
            )
            if self._injected_valid_rows is not None:
                # Pre-padded engine bank: the padding rows beyond m are
                # excluded from sampling, assignment, and the layout
                # (build_ivf_sharded valid_rows) below.
                m = int(self._injected_valid_rows)
            bank_s = bank_s.astype(store)
        n_leaves, cap = self._tree_geometry(m)
        self._n_leaves, self._cap = n_leaves, cap
        rng = np.random.default_rng(self.seed)
        n_sample = min(m, self.tree_sample_rows)
        # Cross-shard gather of the (small) training sample, with the
        # output sharding pinned FULLY REPLICATED: downstream consumers
        # (train_centroids, refine_centroids_balanced's host layout)
        # fetch it to host, which on a multi-host mesh is only legal for
        # replicated arrays — a GSPMD-chosen gather sharding is not.
        idx = jnp.asarray(rng.choice(m, n_sample, replace=False))
        sample = jax.jit(
            lambda b, i: b[i].astype(jnp.float32),
            out_shardings=jax.NamedSharding(
                mesh, jax.sharding.PartitionSpec()
            ),
        )(bank_s, idx)
        self.centroids = train_centroids(
            sample, n_leaves, iters=self.kmeans_iters,
            key=jax.random.PRNGKey(self.seed),
        )
        if self.full_lloyd_iters > 0:
            # Full-bank Lloyd (psum over the bank axis) BEFORE the
            # capacity refinement — plain Lloyd after it would undo the
            # capacity-respecting pull (measured: recall 0.85 -> 0.80).
            from hbird_tpu.parallel.sharded_ivf import sharded_kmeans

            self.centroids = sharded_kmeans(
                bank_s, self.centroids, mesh,
                iters=self.full_lloyd_iters, valid_rows=m,
            )
        if self.tree_refine_rounds > 0:
            self.centroids = refine_centroids_balanced(
                sample, self.centroids, slack=self.tree_slack,
                rounds=self.tree_refine_rounds,
            )
        if labels is None:
            labels = np.zeros((m, 1), np.float32)
        if row_scale_sharded is not None:
            # Append the scales as one extra label column: they ride the
            # ppermute scatter ring into the slab layout for free and are
            # split back off below.
            labels_s, _ = shard_rows(
                labels
                if isinstance(labels, jax.Array)
                else np.asarray(labels, np.float32),
                mesh,
            )
            labels = jnp.concatenate(
                [labels_s.astype(jnp.float32), row_scale_sharded], axis=1
            )
        parts = build_ivf_sharded(
            bank_s, labels, self.centroids, n_leaves, cap, mesh,
            valid_rows=m, layout=self.tree_build_layout,
        )
        self.centroids = parts["centroids"]
        self.bank = parts["ivf_bank"]
        self.labels = parts["ivf_labels"]
        if row_scale_sharded is not None:
            self._bank_row_scale = self.labels[:, -1:]
            self.labels = self.labels[:, :-1]
        # layout='device' hands back mesh-sharded jax arrays (keep the
        # sharding); 'host' hands back numpy.
        self.perm = (
            parts["perm"] if isinstance(parts["perm"], jax.Array)
            else jnp.asarray(parts["perm"], jnp.int32)
        )
        self.slots = (
            parts["slots"] if isinstance(parts["slots"], jax.Array)
            else jnp.asarray(parts["slots"], jnp.int32)
        )
        self.leaf_valid = jnp.asarray(parts["leaf_fill"], jnp.int32)
        self.valid_rows = m

    @classmethod
    def from_tree_state(
        cls,
        ivf_bank,
        ivf_labels,
        centroids,
        leaf_valid,
        perm,
        slots,
        *,
        cap: int,
        valid_rows: int,
        n_neighbors: int = 30,
        bank_scale=None,
        bank_row_scale=None,
        bank_col_scale=None,
        mesh=None,
        **kwargs,
    ):
        """Construct the tree backend from PREBUILT leaf slabs, skipping
        the flat-bank build entirely.

        For pipelines that stream the bank (slab generators, .bankdir
        loads) and scatter directly into the leaf layout — at 10.24M
        int8 rows the flat bank (7.9 GB) plus the slab layout (9.1 GB)
        cannot coexist on a 16 GB chip, so the build must never hold
        both (scripts/bench_northstar.py --nn-method ivf).
        """
        self = cls.__new__(cls)
        n_slots = ivf_bank.shape[0]
        assert n_slots % cap == 0, (n_slots, cap)
        kwargs.setdefault("num_leaves", n_slots // cap)
        kwargs.setdefault("use_tree", True)
        kwargs.setdefault("use_int8", ivf_bank.dtype == jnp.int8)
        if kwargs["use_int8"]:
            # Same contract as the flat int8 injection path: without the
            # quantization scale(s), scores would silently come out
            # scaled by the dummy build's garbage _bank_scale.
            assert bank_scale is not None or bank_row_scale is not None, (
                "int8 slab injection requires bank_scale or bank_row_scale"
            )
            if bank_row_scale is not None:
                kwargs.setdefault("quantization", "int8_rows")
            else:
                kwargs.setdefault("bank_scale", bank_scale)
        if (
            str(kwargs.get("quantization") or "").lower()
            in ("int8_rows", "int8_asym")
            and bank_row_scale is None
        ):
            # Injected slabs are already quantized; without the per-slot
            # scales the dummy build's 2-row scales would be installed
            # below and every score would be garbage (or shape-assert).
            raise ValueError(
                f"quantization={kwargs['quantization']!r} slab injection "
                "requires bank_row_scale (the per-slot scales the codes "
                "were quantized with)"
            )
        # Route through __init__ machinery minus the index build: set the
        # config fields via a tiny dummy, then install the real state.
        # The dummy builds with mesh=None — a meshed dummy would run the
        # FULL distributed build machinery (sharded k-means, shard_map
        # assignment, ring scatter) on 2 rows: several fresh XLA compiles
        # through the remote tunnel, all immediately overwritten below.
        # No __init__ config derives from mesh, so installing it after
        # is equivalent.
        cfg = cls(
            np.zeros((2, ivf_bank.shape[1]), np.float32),
            n_neighbors=n_neighbors,
            label_memory=np.zeros((2, ivf_labels.shape[1]), np.float32),
            mesh=None,
            **kwargs,
        )
        self.__dict__.update(cfg.__dict__)
        self.mesh = mesh
        self.feature_memory = None
        self.bank = ivf_bank
        self.labels = (
            ivf_labels
            if ivf_labels.dtype == jnp.float32
            else ivf_labels.astype(jnp.float32)
        )
        self.centroids = jnp.asarray(centroids, jnp.float32)
        self.leaf_valid = jnp.asarray(leaf_valid, jnp.int32)
        self.perm = jnp.asarray(perm, jnp.int32)
        self.slots = jnp.asarray(slots, jnp.int32)
        self._n_leaves = n_slots // cap
        self._cap = cap
        self.valid_rows = int(valid_rows)
        if bank_row_scale is not None:
            self._bank_row_scale = jnp.asarray(
                bank_row_scale, jnp.float32
            ).reshape(-1, 1)
            self._bank_scale = None
        else:
            # Same reasoning as the col-scale reset below: any row scales
            # on the dummy cfg came from quantizing its 2-row bank and
            # must never survive onto real injected slabs.
            self._bank_row_scale = None
            if bank_scale is not None:
                self._bank_scale = jnp.float32(bank_scale)
        if bank_col_scale is not None:
            # score_ah column-block scales persisted with the tree; the
            # search path folds them into the queries. dims_per_block
            # itself need not survive the round-trip — the scales are
            # the quantization's complete artifact.
            self._bank_col_scale = jnp.asarray(bank_col_scale, jnp.float32)
        else:
            # Injected slabs are already quantized; a dims_per_block in
            # kwargs can only have produced garbage scales on the 2-row
            # dummy — never let them rescale real queries.
            self._bank_col_scale = None
        return self

    @classmethod
    def from_bankdir(
        cls,
        feature_dir: str,
        label_dir: Optional[str] = None,
        *,
        n_neighbors: int = 30,
        window_rows: int = 524288,
        num_leaves: int = 512,
        tree_slack: float = 1.3,
        kmeans_iters: int = 12,
        tree_refine_rounds: int = 2,
        tree_sample_rows: int = 131072,
        seed: int = 0,
        bank_scale=None,
        mesh=None,
        **kwargs,
    ):
        """Build the tree backend straight from on-disk .bankdir banks via
        the streamed three-pass build (ops/ivf.build_tree_streamed) —
        banks larger than host RAM or too large to coexist with their
        slab layout on one chip never materialize flat anywhere.

        With `mesh`, each disk window scatters straight to its owning
        shard (leaf-sharded slabs over the 'bank' axis), so banks larger
        than any single shard's HBM stream directly onto the mesh.

        int8 .bankdirs require `bank_scale` (the global symmetric scale
        the rows were quantized with). Float .bankdirs are cast to the
        tree's store dtype (bf16 unless use_fp16=False) window-by-window;
        `use_int8` cannot apply to a float .bankdir (quantization would
        need an extra full scale pass) — store an int8 .bankdir with its
        scale instead."""
        from hbird_tpu.bank.io import (
            _manifest_dtype, iter_bankdir_windows, sharded_memory_info,
        )
        from hbird_tpu.ops.ivf import build_tree_streamed

        info = sharded_memory_info(feature_dir)
        is_int8 = _manifest_dtype(info) == np.int8
        qz = str(kwargs.get("quantization") or "").lower()
        if qz in ("int8_rows", "int8_asym"):
            # Streamed builds never hold the flat rows, so there is no
            # place to measure per-row scales without an extra full
            # pass; int8 .bankdirs carry a GLOBAL scale by contract.
            raise ValueError(
                f"quantization={qz!r} is not supported for streamed "
                ".bankdir tree builds — quantize at save time (global "
                "scale) or build from an in-memory bank."
            )
        if kwargs.pop("use_int8", False) and not is_int8:
            from hbird_tpu.utils.logging import get_logger

            get_logger(__name__).warning(
                "use_int8 ignored for a %s .bankdir streamed load — "
                "quantization would need an extra full pass; save an "
                "int8 .bankdir + bank_scale for the quantized path.",
                info["dtype"],
            )
        store = (
            jnp.int8 if is_int8
            else (jnp.bfloat16 if kwargs.get("use_fp16", True) else jnp.float32)
        )

        def stream():
            for rows, labs in iter_bankdir_windows(
                feature_dir, label_dir, window_rows=window_rows
            ):
                yield jnp.asarray(rows).astype(store), labs

        parts = build_tree_streamed(
            stream,
            info["rows"],
            num_leaves,
            slack=tree_slack,
            kmeans_iters=kmeans_iters,
            refine_rounds=tree_refine_rounds,
            sample_rows=tree_sample_rows,
            seed=seed,
            mesh=mesh,
        )
        return cls.from_tree_state(
            parts["ivf_bank"],
            parts["ivf_labels"],
            parts["centroids"],
            parts["leaf_fill"],
            parts["perm"],
            parts["slots"],
            cap=parts["cap"],
            valid_rows=parts["valid_rows"],
            n_neighbors=n_neighbors,
            bank_scale=bank_scale,
            # the meshed build may round the leaf count up to the mesh
            # axis size; parts carries the real geometry
            num_leaves=parts["n_leaves"],
            tree_slack=tree_slack,
            mesh=mesh,
            **kwargs,
        )

    # ------------------------------------------------------------------
    # Built-tree persistence (.treedir) — ScaNN's searcher serialization
    # counterpart: the reference rebuilds its ScaNN tree from the flat
    # bank every run (reference hbird/nn/search_scann.py:21-33); saving
    # the CONSTRUCTED index skips k-means + balanced layout + scatter on
    # reload (~a minute at 10M rows) and never materializes a flat bank.
    # ------------------------------------------------------------------
    def save_tree(self, dir_path: str, *, chunk_rows: int = 262144) -> str:
        """Serialize the built tree (leaf slabs + centroids + layout) to
        `dir_path` (conventionally ending in '.treedir'). Slabs are pulled
        from the device chunk-by-chunk — peak host memory is one chunk.
        Works for int8 (scale stored), bf16 (stored as uint16 bits), and
        f32 trees, single-device or mesh-sharded."""
        if not self.use_tree or getattr(self, "_cap", None) is None:
            raise ValueError(
                "save_tree requires a BUILT tree backend "
                "(use_tree=true / nn_method='ivf')"
            )
        from hbird_tpu.bank.io import save_tree_state

        scale = (
            float(np.asarray(self._bank_scale))
            if self.use_int8 and self._bank_scale is not None
            else None
        )
        labels_out = self.labels
        row_scale_in_labels = (
            self.use_int8 and self._bank_row_scale is not None
        )
        if row_scale_in_labels:
            # Per-slot scales persist as one extra label column (same
            # slab layout, same chunked/multi-process write path); split
            # back off at load (meta flag).
            labels_out = jnp.concatenate(
                [self.labels.astype(jnp.float32), self._bank_row_scale],
                axis=1,
            )
        return save_tree_state(
            dir_path,
            ivf_bank=self.bank,
            ivf_labels=labels_out,
            centroids=self.centroids,
            leaf_valid=self.leaf_valid,
            perm=self.perm,
            slots=self.slots,
            cap=self._cap,
            valid_rows=self.valid_rows,
            bank_scale=scale,
            row_scale_in_labels=row_scale_in_labels,
            col_scale=(
                np.asarray(self._bank_col_scale, np.float32)
                if self._bank_col_scale is not None
                else None
            ),
            asym=self.int8_asym,
            chunk_rows=chunk_rows,
        )

    @classmethod
    def load_tree(
        cls,
        dir_path: str,
        *,
        n_neighbors: int = 30,
        mesh=None,
        **kwargs,
    ):
        """Reconstruct the tree backend from a save_tree() directory.

        Slabs stream to the device chunk-by-chunk with donated updates
        (with a mesh: directly row-sharded over the bank axis — leaf
        slabs stay shard-aligned because n_slots = n_leaves * cap).
        Search-time params (num_leaves_to_search, recall_target, ...)
        pass through `kwargs`."""
        from hbird_tpu.bank.io import load_tree_state

        state = load_tree_state(dir_path, mesh=mesh)
        if state.pop("asym", False):
            # The saved tree scored asymmetrically (bf16 queries x int8
            # codes); restore that mode unless the caller overrides it.
            kwargs.setdefault("quantization", "int8_asym")
        return cls.from_tree_state(
            state["ivf_bank"],
            state["ivf_labels"],
            state["centroids"],
            state["leaf_valid"],
            state["perm"],
            state["slots"],
            cap=state["cap"],
            valid_rows=state["valid_rows"],
            n_neighbors=n_neighbors,
            bank_scale=state["bank_scale"],
            bank_row_scale=state.get("bank_row_scale"),
            bank_col_scale=state.get("bank_col_scale"),
            mesh=mesh,
            num_leaves=state["n_leaves"],
            **kwargs,
        )

    def _add_features_to_index(self):
        store = jnp.bfloat16 if self.use_fp16 else jnp.float32
        bank_in = self.feature_memory
        labels = self.label_memory
        self.rerank_bank = None
        if self.use_int8 and not self.use_tree:
            # Flat quantized scan: same schemes as the exact backend
            # (global or per-row symmetric int8); the flat dot path below
            # routes to the fused kernel which dequantizes row-scaled
            # scores in its epilogue.
            if isinstance(bank_in, jax.Array) and bank_in.dtype == jnp.int8:
                # Pre-quantized injection (same contract as the tree
                # paths): re-quantizing the codes would clobber the
                # injected scale with ~1.0 and de-calibrate the scores
                # the engine's cross-attention softmax consumes.
                assert self._bank_scale is not None, (
                    "int8 bank injection requires bank_scale"
                )
                assert not self.int8_rows, (
                    "pre-quantized int8 injection is global-scale only"
                )
            else:
                bank_f = (
                    bank_in.astype(jnp.float32)
                    if isinstance(bank_in, jax.Array)
                    else jnp.asarray(np.asarray(bank_in, np.float32))
                )
                bank_in, scale = self._quantize_bank(bank_f)
                if self.int8_rows:
                    self._bank_row_scale = scale
                else:
                    self._bank_scale = scale
                self.feature_memory = bank_in
                if self.num_reordering_candidates > self.n_neighbors:
                    # Explicitly requested reorder(C) on a quantized scan
                    # (the ScaNN-literal config): keep a bf16 copy for the
                    # exact re-scoring pass, like the exact backend.
                    self.rerank_bank = bank_f.astype(jnp.bfloat16)
                del bank_f
            store = jnp.int8
        if self.use_tree:
            meshed = (
                self.mesh is not None and self.mesh.shape.get("bank", 1) > 1
            )
            if not meshed:
                self.mesh = None
                self._build_tree(bank_in, labels, store)
                return
            if self.num_reordering_candidates > self.n_neighbors:
                from hbird_tpu.utils.logging import get_logger

                get_logger(__name__).warning(
                    "num_reordering_candidates is not supported with a "
                    "leaf-sharded tree; returned scores are the "
                    "first-pass scan scores."
                )
            self._build_tree_sharded(bank_in, labels, store)
            return
        if self.mesh is not None and self.mesh.shape.get("bank", 1) > 1:
            from hbird_tpu.parallel.sharded_knn import shard_bank

            if isinstance(bank_in, jax.Array):
                # Device-resident (possibly pre-padded) bank: shard_bank's
                # device path pads + reshards without a host round-trip.
                if labels is None:
                    labels = jnp.zeros((bank_in.shape[0], 1), jnp.float32)
                bank = bank_in.astype(store)
                labels = (
                    labels.astype(jnp.float32)
                    if isinstance(labels, jax.Array)
                    else jnp.asarray(np.asarray(labels, np.float32))
                )
            else:
                bank = np.asarray(bank_in, dtype=np.float32).astype(store)
                if labels is None:
                    labels = np.zeros((bank.shape[0], 1), np.float32)
                labels = np.asarray(labels, np.float32)
            self.bank, self.labels, self.valid_rows = shard_bank(
                bank, labels, self.mesh
            )
            if self._injected_valid_rows is not None:
                self.valid_rows = int(self._injected_valid_rows)
            if self._bank_row_scale is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                rs = self._bank_row_scale
                pad = self.bank.shape[0] - rs.shape[0]
                if pad:
                    rs = jnp.pad(rs, ((0, pad), (0, 0)))
                self._bank_row_scale = jax.device_put(
                    rs, NamedSharding(self.mesh, P("bank"))
                )
            if self.rerank_bank is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                rb = self.rerank_bank
                pad = self.bank.shape[0] - rb.shape[0]
                if pad:
                    rb = jnp.pad(rb, ((0, pad), (0, 0)))
                self.rerank_bank = jax.device_put(
                    rb, NamedSharding(self.mesh, P("bank"))
                )
            return
        self.mesh = None
        if isinstance(bank_in, jax.Array):
            self.bank = bank_in.astype(store)
        else:
            self.bank = jnp.asarray(np.asarray(bank_in, np.float32), store)
        if labels is None:
            labels = jnp.zeros((self.bank.shape[0], 1), jnp.float32)
        self.labels = (
            labels.astype(jnp.float32)
            if isinstance(labels, jax.Array)
            else jnp.asarray(np.asarray(labels, np.float32))
        )
        self.valid_rows = self.bank.shape[0]
        if self._injected_valid_rows is not None:
            self.valid_rows = int(self._injected_valid_rows)

    def calibrate_n_probe(
        self,
        recall_target: float,
        *,
        k: Optional[int] = None,
        n_queries: int = 21904,
        seed: int = 0,
        max_probe: Optional[int] = None,
    ) -> int:
        """Pick the smallest `num_leaves_to_search` whose measured
        recall@k meets `recall_target`, and install it.

        ScaNN's builder takes a recall target and tunes the tree
        internally; here it is measured directly — probing ALL leaves
        through the same tree path is exact search, so recall is the
        shortlist overlap on `n_queries` bank rows used as their own
        queries. Query DENSITY matters (block-level probing shares a
        shortlist per sorted 256-query tile): the default matches an
        engine batch (16 imgs x 37^2 patches); sparse calibration sets
        would understate recall.

        Meshed trees calibrate through the REAL sharded search path
        (sharded_ivf_knn_with_labels, honoring `shard_probe` semantics),
        so the measured recall is exactly what the deployed
        configuration delivers — probing every leaf per shard is still
        the exact-search oracle.

        Returns the chosen probe count. One-time cost: one full-probe
        scan of the calibration queries plus one scan per candidate
        probe count (geometric ladder + bisection, ~8-12 candidates).
        Each distinct probe count is a NEW static shape — on a remote
        Mosaic compiler with a cold cache that is a fresh Pallas compile
        per candidate (tens of seconds each, occasionally minutes);
        subsequent calibrations hit the compile cache.
        """
        assert self.use_tree, "probe calibration is a tree-mode feature"
        from hbird_tpu.ops.ivf import ivf_search
        from hbird_tpu.utils.logging import get_logger

        k = k or self.n_neighbors
        rng = np.random.default_rng(seed)
        n_q = min(n_queries, self.valid_rows)
        choice = jnp.asarray(rng.choice(self.valid_rows, n_q, replace=False))
        meshed = self.mesh is not None and self.mesh.shape.get("bank", 1) > 1
        if meshed:
            from jax.sharding import NamedSharding, PartitionSpec

            # Replicated gathers: slots/bank may be mesh-sharded, and on
            # a multi-host mesh only replicated outputs are
            # host-readable / safe to feed back in as queries.
            rep = NamedSharding(self.mesh, PartitionSpec())
            rows = jax.jit(
                lambda s, c: jnp.take(s, c, axis=0), out_shardings=rep
            )(self.slots, choice)
            q = jax.jit(
                lambda b, r: jnp.take(b, r, axis=0), out_shardings=rep
            )(self.bank, rows)

            from hbird_tpu.parallel.sharded_ivf import (
                sharded_ivf_knn_with_labels,
            )

            # Calibration only needs neighbour INDICES; the sharded
            # search also gathers/psums (Q, k, C) merged labels. Feed a
            # 1-column view of the (row-sharded) labels so each scan
            # moves k floats per query across the ICI instead of k*C.
            labels_1 = jax.jit(lambda l: l[:, :1])(self.labels)

            def probe(n_probe, probe_mode="tile"):
                # The sharded tree path is tile-probing only (per-query
                # probing is a host-orchestrated single-chip feature);
                # meshed calibration therefore always measures tile mode.
                # row_scale rides along so int8_rows trees calibrate
                # against the DEQUANTIZED ordering the runtime ranks by
                # (raw code dots order differently per row).
                _, idx, _ = sharded_ivf_knn_with_labels(
                    q, self.bank, labels_1, self.centroids,
                    self.leaf_valid, k, mesh=self.mesh, cap=self._cap,
                    n_probe=n_probe, block_q=self.query_block,
                    shard_probe=self.shard_probe,
                    row_scale=self._bank_row_scale,
                )
                return np.asarray(idx)
        else:
            rows = jnp.take(self.slots, choice, axis=0)
            q = jnp.take(self.bank, rows, axis=0)

            # Calibrate under the probing granularity the runtime will
            # use: an explicit 'query' backend measures per-query recall
            # (tile probing under-reads it on these iid bank-row queries
            # and would inflate n_probe). 'auto' calibrates as TILE —
            # the conservative floor: engine-density runtime resolves to
            # tile, and a sparse runtime that auto-flips to per-query
            # only gains recall at the calibrated probe count. (Letting
            # 'auto' resolve per candidate would flip modes across the
            # ladder and calibrate optimistically for tile runtimes.)
            cal_mode = "query" if self.probe_mode == "query" else "tile"

            def probe(n_probe, probe_mode=cal_mode):
                # row_scale: calibrate against the dequantized ordering
                # the runtime ranks by (int8_rows only; None otherwise).
                _, idx = ivf_search(
                    q, self.bank, self.centroids, self.leaf_valid, k,
                    cap=self._cap, n_probe=n_probe,
                    block_q=self.query_block, probe_mode=probe_mode,
                    row_scale=self._bank_row_scale,
                )
                return np.asarray(idx)

        # Full probe is exact search under EITHER granularity (every leaf
        # is scanned for every tile); run the oracle in tile mode — with
        # probe_mode='query' it would materialize Q * n_leaves duplicated
        # query rows for an identical result set.
        oracle = probe(self._n_leaves, probe_mode="tile")

        def recall(idx):
            return float(np.mean([
                len(set(idx[i]) & set(oracle[i])) / k for i in range(n_q)
            ]))

        hi_cap = min(max_probe or self._n_leaves, self._n_leaves)
        # Geometric ladder, then one bisection refinement level.
        lo = 0
        n_probe = 1
        while n_probe < hi_cap:
            r = recall(probe(n_probe))
            if r >= recall_target:
                break
            lo = n_probe
            n_probe *= 2
        else:
            n_probe = hi_cap
            # hi_cap == n_leaves IS the oracle — don't re-scan it.
            r = 1.0 if hi_cap == self._n_leaves else recall(probe(n_probe))
        while n_probe - lo > max(1, lo // 4):
            mid = (lo + n_probe) // 2
            r_mid = recall(probe(mid))
            if r_mid >= recall_target:
                n_probe, r = mid, r_mid
            else:
                lo = mid
        get_logger(__name__).info(
            "Calibrated num_leaves_to_search=%d for recall_target=%.3f "
            "(measured recall@%d=%.4f over %d queries)",
            n_probe, recall_target, k, r, n_q,
        )
        self.num_leaves_to_search = n_probe
        return n_probe

    @property
    def device_state(self):
        """Large device arrays as a pytree (jit-argument safe; see
        search_exact.device_state)."""
        state = {"bank": self.bank, "labels": self.labels}
        if self.use_tree:
            state.update(
                centroids=self.centroids,
                leaf_valid=self.leaf_valid,
                perm=self.perm,
                slots=self.slots,
            )
        if getattr(self, "rerank_bank", None) is not None:
            state["rerank_bank"] = self.rerank_bank
        if self.use_int8:
            if self._bank_row_scale is not None:
                state["bank_row_scale"] = self._bank_row_scale
            else:
                state["bank_scale"] = self._bank_scale
            if self._bank_col_scale is not None:
                state["bank_col_scale"] = self._bank_col_scale
        return state

    def state_spec(self, n_rows: int):
        if not self.use_tree:
            return super().state_spec(n_rows)
        # Tree-mode shapes derive from the LAYOUT of an n_rows bank, not
        # from this instance's arrays (the AOT dummy is built on 2 rows).
        n_leaves, cap = self._tree_geometry(n_rows)
        n_slots = n_leaves * cap
        d = self.bank.shape[1]
        n_classes = self.labels.shape[1]
        spec = {
            "bank": jax.ShapeDtypeStruct((n_slots, d), self.bank.dtype),
            "labels": jax.ShapeDtypeStruct((n_slots, n_classes), jnp.float32),
            "centroids": jax.ShapeDtypeStruct((n_leaves, d), jnp.float32),
            "leaf_valid": jax.ShapeDtypeStruct((n_leaves,), jnp.int32),
            "perm": jax.ShapeDtypeStruct((n_slots,), jnp.int32),
            # The device-layout meshed build keeps slots row-sharded and
            # therefore padded up to a multiple of the bank axis. When
            # THIS instance already holds the real n_rows tree (e.g. a
            # .treedir load, whose build-time layout the config no longer
            # records), the persisted array length is authoritative — a
            # real tree's slots always covers all n_rows, while the AOT
            # dummy's 2-row slots never does (pin_expected_rows resets
            # valid_rows, so the array LENGTH is the discriminator).
            "slots": jax.ShapeDtypeStruct((
                self.slots.shape[0]
                if getattr(self, "slots", None) is not None
                and self.slots.shape[0] >= n_rows
                else (
                    _round_up_rows(n_rows, self.mesh)
                    if self.tree_build_layout == "device"
                    and self.mesh is not None
                    else n_rows
                ),
            ), jnp.int32),
        }
        if self.use_int8:
            if self.int8_rows:
                # Per-slot scales: one per slab row, like the bank.
                spec["bank_row_scale"] = jax.ShapeDtypeStruct(
                    (n_slots, 1), jnp.float32
                )
            else:
                spec["bank_scale"] = jax.ShapeDtypeStruct((), jnp.float32)
            if self._bank_col_scale is not None:
                # Mirrors device_state exactly: the AOT dummy build runs
                # the same quantizer, so the scales exist on any instance
                # whose real twin would carry them (.treedir loads install
                # them from the manifest — the knob itself need not
                # survive).
                spec["bank_col_scale"] = jax.ShapeDtypeStruct(
                    (d,), jnp.float32
                )
        return spec

    def pin_expected_rows(self, n_rows: int) -> None:
        super().pin_expected_rows(n_rows)
        if self.use_tree:
            # Static kernel geometry (cap) must match the real bank's.
            self._n_leaves, self._cap = self._tree_geometry(n_rows)

    def gather_features_pure(self, state, idx: jax.Array) -> jax.Array:
        if not self.use_tree:
            return super().gather_features_pure(state, idx)
        # idx is in ORIGINAL row ids; the stored bank is leaf-ordered.
        slot_idx = jnp.take(state["slots"], idx, axis=0)
        rows = jnp.take(state["bank"], slot_idx, axis=0)
        if rows.dtype == jnp.int8 and "bank_row_scale" in state:
            # Per-slot scales live in the same slab layout as the rows.
            rows = rows.astype(jnp.float32) * jnp.take(
                state["bank_row_scale"], slot_idx, axis=0
            )
        elif rows.dtype == jnp.int8 and "bank_scale" in state:
            rows = rows.astype(jnp.float32) * state["bank_scale"]
        if rows.dtype == jnp.float32 and "bank_col_scale" in state:
            # Separable score_ah dequantization: x = codes * s_row * c.
            rows = rows * state["bank_col_scale"]
        return rows

    def search_with_labels(self, q: jax.Array, k: Optional[int] = None):
        return self.search_with_labels_pure(self.device_state, q, k)

    def search_with_labels_pure(self, state, q: jax.Array, k: Optional[int] = None):
        bank = state["bank"]
        labels = state["labels"]
        k = k or self.n_neighbors
        if self.use_tree:
            from hbird_tpu.ops.ivf import ivf_search

            # reorder with int8 is a no-op (re-scoring from the same int8
            # rows preserves the quantized ordering), so skip the pass.
            reorder = self.num_reordering_candidates > k and not self.use_int8
            # ScaNN reorder(C): one widened probe pass to C candidates,
            # then exact f32 re-scoring of the stored rows, keep top-k.
            kk = self.num_reordering_candidates if reorder else k
            if kk > 128:
                # The fused tree kernel holds the running top-kk in VMEM
                # and supports kk <= 128; ScaNN-style reorder(250) configs
                # clamp rather than die in a kernel assert (same clamp on
                # CPU/XLA so results are platform-independent).
                from hbird_tpu.utils.logging import get_logger

                get_logger(__name__).warning(
                    "num_reordering_candidates=%d exceeds the tree "
                    "kernel's 128-candidate limit; clamping to 128.",
                    kk,
                )
                kk = 128
            row_scale = state.get("bank_row_scale")
            col_scale = state.get("bank_col_scale")
            if self.use_int8:
                # dimensions_per_block column scales fold into the query
                # (scores = s_row * dot(q*c, codes) — exact separable
                # dequantization, kernels untouched).
                qq = (
                    q.astype(jnp.float32) * col_scale
                    if col_scale is not None
                    else q
                )
                if self.int8_asym:
                    # Asymmetric: bf16 queries against int8 slabs (the
                    # kernel casts each tile; row_scale dequantizes).
                    q_cast = qq.astype(jnp.bfloat16)
                    q_scale = None
                else:
                    from hbird_tpu.ops.quantize import quantize_queries_int8

                    q_cast, q_scale = quantize_queries_int8(qq)
            else:
                q_cast = q.astype(bank.dtype)
            if self.mesh is not None and self.mesh.shape.get("bank", 1) > 1:
                from hbird_tpu.parallel.sharded_ivf import (
                    sharded_ivf_knn_with_labels,
                )

                # Meshed tree: merged labels come out of the shard_map
                # (masked psum), and reorder is not supported.
                vals, idx_ivf, out_labels = sharded_ivf_knn_with_labels(
                    q_cast, bank, labels, state["centroids"],
                    state["leaf_valid"], k,
                    mesh=self.mesh, cap=self._cap,
                    n_probe=min(self.num_leaves_to_search, self._n_leaves),
                    block_q=self.query_block,
                    shard_probe=self.shard_probe,
                    row_scale=row_scale,
                )
                if self.use_int8 and not self.int8_asym:
                    # Row-scaled scores already carry the bank-side scale
                    # (asym scores carry both — bf16 queries).
                    vals = vals * (
                        q_scale if row_scale is not None
                        else state["bank_scale"] * q_scale
                    )
                idx = jnp.maximum(
                    jnp.take(state["perm"], idx_ivf, axis=0), 0
                )
                return vals, idx, out_labels
            vals, idx_ivf = ivf_search(
                q_cast,
                bank,
                state["centroids"],
                state["leaf_valid"],
                kk,
                cap=self._cap,
                n_probe=min(self.num_leaves_to_search, self._n_leaves),
                block_q=self.query_block,
                probe_mode=self.probe_mode,
                row_scale=row_scale,
            )
            if self.use_int8 and not self.int8_asym:
                # int32 scores -> approximate dot products (calibrated for
                # the downstream cross-attention temperature; row-scaled
                # scores already carry the bank-side scale; asym scores
                # carry both — bf16 queries).
                vals = vals * (
                    q_scale if row_scale is not None
                    else state["bank_scale"] * q_scale
                )
            if reorder:
                from hbird_tpu.ops.knn import rerank_exact

                # Streamed over query blocks — a one-shot (Q, C, D)
                # gather would cost ~8 GB at engine batch sizes.
                vals, idx_ivf = rerank_exact(
                    q.astype(jnp.float32), bank, idx_ivf, k,
                    cand_valid=jnp.isfinite(vals),
                )
            out_labels = jnp.take(labels, idx_ivf, axis=0)
            # Public indices are ORIGINAL row ids (reference semantics).
            # Padding slots are leaf_valid-masked to -inf, but degenerate
            # probes (< k valid candidates) can surface them with perm=-1;
            # clamp to 0 like the exact backend's padded-row convention.
            idx = jnp.maximum(jnp.take(state["perm"], idx_ivf, axis=0), 0)
            return vals, idx, out_labels
        # `reorder(C)` semantics (reference search_scann.py:32): grab C
        # approximate candidates, exact-rescore, keep the top k.
        if self.distance_measure in ("dot_product", "l2", "euclidean"):
            # The fused exact kernel DOMINATES the PartialReduce primitive
            # on TPU — 59.6k vs 21.7k q/s at 1M rows at recall 1.0 vs
            # 0.9998, and 12x the ScaNN-literal reorder(120) config
            # (scripts/bench_backends.py) — so the flat path routes to it
            # and skips reorder (re-scoring exact results is a no-op).
            # Since round 4 the kernel covers expanded-norm l2 too, so
            # both Faiss-parity metrics take the fast path; approximation
            # that actually PAYS on TPU is the leaf-partitioned tree
            # (use_tree=True).
            distance = (
                "dot_product"
                if self.distance_measure == "dot_product"
                else "l2"
            )
            row_scale = state.get("bank_row_scale")
            rerank_bank = state.get("rerank_bank")
            rerank = (
                self.use_int8
                and rerank_bank is not None
                and self.num_reordering_candidates > k
            )
            if self.use_int8 and bank.dtype == jnp.int8:
                col_scale = state.get("bank_col_scale")
                # Column-block scales fold into the query (separable
                # dequantization); rerank below re-scores with the
                # ORIGINAL q against the exact bf16 rows, unaffected.
                qq = (
                    q.astype(jnp.float32) * col_scale
                    if col_scale is not None
                    else q
                )
                if self.int8_asym:
                    q_cast = qq.astype(jnp.bfloat16)
                    q_scale = None
                else:
                    from hbird_tpu.ops.quantize import quantize_queries_int8

                    q_cast, q_scale = quantize_queries_int8(qq)
            else:
                q_cast = q.astype(bank.dtype)
            vals, idx, out_labels = sharded_knn_with_labels(
                q_cast,
                bank,
                labels,
                k,
                mesh=self.mesh,
                valid_rows=self.valid_rows,
                distance=distance,
                query_block=self.query_block,
                bank_block=self.bank_block,
                kernel="pallas",
                rerank_bank=rerank_bank if rerank else None,
                rerank_queries=q.astype(jnp.bfloat16) if rerank else None,
                rerank_candidates=(
                    self.num_reordering_candidates if rerank else 0
                ),
                row_scale=row_scale,
            )
            if (
                self.use_int8 and bank.dtype == jnp.int8
                and not rerank and not self.int8_asym
            ):
                # Reranked scores are already exact bf16 dot products;
                # row-scaled scores already carry the bank-side scale;
                # asym scores carry both — bf16 queries.
                vals = vals * (
                    q_scale if row_scale is not None
                    else state["bank_scale"] * q_scale
                )
            return vals, idx, out_labels
        return sharded_knn_with_labels(
            q.astype(bank.dtype),
            bank,
            labels,
            k,
            mesh=self.mesh,
            valid_rows=self.valid_rows,
            distance=self.distance_measure,
            approx=True,
            recall_target=self.recall_target,
            query_block=self.query_block,
            bank_block=self.bank_block,
        )

    def find_nearest_neighbors(
        self, q, k: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        k = k or self.n_neighbors
        vals, idx, _ = self.search_with_labels(jnp.asarray(np.asarray(q)), k)
        return np.asarray(idx), np.asarray(vals)
