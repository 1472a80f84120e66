"""The Hummingbird evaluation engine, TPU-native.

Public API mirrors the reference (hbird/hbird_eval.py:54-722): an
`HbirdEvaluation` class that builds a feature+soft-label memory bank from
a training loader and scores a validation loader by k-NN retrieval +
cosine cross-attention label transfer + class-matching mIoU, plus the
one-call `hbird_evaluation(...)` wrapper.

TPU-first dataflow (vs the reference's per-batch GPU<->CPU<->Faiss hops,
hbird_eval.py:214-246):

- ONE jitted memory step per batch shape: backbone forward + GT patchify
  + soft labels (+ bounded rarity sampling) fused into a single XLA
  program; only the resulting (rows, D)+(rows, C) slabs come back to host,
  where they are written into the preallocated bank.
- ONE jitted eval step: backbone forward -> sharded exact kNN (tiled MXU
  matmul + streaming top-k, all_gather merge across the mesh's bank axis)
  -> fused score-based cross-attention (bank rows are unit-norm, so
  neighbour features never materialize) -> bilinear upsample -> argmax ->
  on-device confusion matrix. Per batch, only (G, P) conf-mat counts and
  (B, H, W) predicted maps leave the device.
- Ragged last batches are padded to the jitted shape; padded images carry
  ignore-labelled GT and their bank rows are discarded host-side — so
  each step compiles exactly once (axon remote compiles are expensive).

Behavioral quirks kept for parity (SURVEY Appendix):
- memory build folds ignore label 255 into background 0
  (reference hbird_eval.py:309-310); eval does NOT remap — the metric
  masks ignore_index (hbird_eval.py:219-220).
- queries are not L2-normalized before retrieval; bank rows are
  (hbird_eval.py:611-630 vs :324) — with dot-product scores and the
  renormalizing cross-attention this equals normalized search.
- features are normalized without an epsilon (hbird_eval.py:324).
- Hungarian matching is the default scoring mode (hbird_eval.py:253).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from tqdm import tqdm
except ImportError:  # pragma: no cover

    def tqdm(iterator, *args, **kwargs):
        return iterator


from hbird_tpu.core.attention import cross_attention_from_scores
from hbird_tpu.core.patchify import patch_soft_labels, patchify_gt
from hbird_tpu.core.sampling import sample_patches
from hbird_tpu.models.extractor import FeatureExtractor, FeatureExtractorSimple
from hbird_tpu.nn.search_approx import NearestNeighborSearchApprox
from hbird_tpu.nn.search_exact import NearestNeighborSearchExact
from hbird_tpu.utils.eval_metrics import PredsmIoU, confusion_matrix
from hbird_tpu.utils.logging import get_logger
from hbird_tpu.utils.profiling import PhaseTimer, maybe_trace

logger = get_logger(__name__)

_NN_ALIASES = {
    "faiss": "exact",
    "exact": "exact",
    "flat": "exact",
    "scann": "approx",
    "approx": "approx",
    # True leaf-partitioned backend (ScaNN tree() semantics): approx
    # class with use_tree on — k-means leaves, capacity-balanced layout,
    # probed-leaf Pallas scan (ops/ivf.py).
    "ivf": "ivf",
    "tree": "ivf",
}


def _as_batch(x) -> np.ndarray:
    """Loader output -> numpy batch; uint8 stays uint8 (device-normalize
    pipelines ship 4x less data), everything else becomes float32."""
    x = np.asarray(x)
    if x.dtype == np.uint8:
        return x
    return x.astype(np.float32, copy=False)


def _pad_batch(x: np.ndarray, batch_size: int) -> Tuple[np.ndarray, int]:
    """Zero-pad a ragged batch up to the compiled batch size."""
    n = x.shape[0]
    if n == batch_size:
        return x, n
    pad = np.zeros((batch_size - n,) + x.shape[1:], x.dtype)
    return np.concatenate([x, pad]), n


def _batch_sharding(mesh):
    """NamedSharding for input batches over the mesh's 'data' axis (None
    when unmeshed). Batches are placed explicitly with device_put so the
    jitted steps inherit every argument's committed sharding (bank state
    stays bank-sharded, params replicated, batches data-sharded)."""
    if mesh is None or mesh.shape.get("data", 1) <= 1:
        return None
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P("data"))


class HbirdEvaluation:
    """Build the memory bank, then evaluate retrieval-based segmentation.

    Args mirror the reference (hbird/hbird_eval.py:97-182); TPU-specific
    extras are keyword-only at the end.

    Args:
        feature_extractor: FeatureExtractor / FeatureExtractorSimple with
            `forward_features`, `eval_spatial_resolution`, `d_model`.
        train_loader: iterable of (images, masks) numpy batches.
        num_classes: C.
        n_neighbours: k (default 30).
        augmentation_epoch: memory-build passes over the train loader.
        device: accepted for API parity; placement is managed by JAX.
        nn_method: 'faiss'/'exact' (exact flat), 'scann'/'approx'
            (default 'scann', matching the reference signature), or
            'ivf'/'tree' (leaf-partitioned scan — ScaNN tree() semantics;
            fastest at multi-million-row banks, recall set by
            num_leaves_to_search).
        nn_params: extra backend kwargs (use_fp16, idx_shard, recall_target,
            num_leaves, ... — see hbird_tpu/nn/).
        memory_size: bank row cap; enables per-image rarity sampling.
        dataset_size: #train images (required with memory_size).
        f_mem_p / l_mem_p: save paths for the feature/label memories.
        mesh: optional jax Mesh with a 'bank' axis to shard the bank over.
        seed: PRNG seed for the sampling noise.
        bf16_bank: store the bank in bfloat16 (faiss useFloat16 analogue).
    """

    def __init__(
        self,
        feature_extractor,
        train_loader,
        num_classes: int,
        n_neighbours: int = 30,
        augmentation_epoch: int = 1,
        device=None,
        nn_method: str = "scann",
        nn_params: Optional[Dict[str, Any]] = None,
        memory_size: Optional[int] = None,
        dataset_size: Optional[int] = None,
        f_mem_p: Optional[str] = None,
        l_mem_p: Optional[str] = None,
        *,
        mesh=None,
        seed: int = 123,
        bf16_bank: bool = False,
        device_norm=None,
        aot_eval: Optional[Dict[str, Any]] = None,
        load_memory: bool = False,
    ) -> None:
        del device  # placement is managed by JAX/the mesh
        # (mean, std) for on-device normalization of uint8 batches (see
        # data/transforms device_normalize). Defaults to the transform
        # module's IMAGENET constants when uint8 batches arrive.
        self._device_norm = device_norm
        self.nn_params = dict(nn_params or {})
        self.feature_extractor = feature_extractor
        method = _NN_ALIASES.get(nn_method.lower())
        if method is None:
            raise AssertionError(
                "Only faiss/exact, scann/approx and ivf/tree are supported"
            )
        self.nn_method = method
        self.augmentation_epoch = augmentation_epoch
        self.memory_size = memory_size
        self.n_neighbours = n_neighbours
        self.num_classes = num_classes
        self.f_mem_p = f_mem_p
        self.l_mem_p = l_mem_p
        self.mesh = mesh
        self.bf16_bank = bf16_bank
        self._dataset_size = dataset_size
        self._key = jax.random.PRNGKey(seed)
        self.timer = PhaseTimer()
        # Real row count of a PADDED mesh-sharded device bank (None =
        # feature_memory rows are all real). Set by _create_memory's
        # meshed device accumulation; consumed by _create_nn/_save_memory.
        self._bank_valid_rows: Optional[int] = None
        # Backbone weights as a device-resident jit argument (see _forward_fn).
        _, self._fwd_operand = self._forward_fn()

        self.num_sampled_features: Optional[int] = None
        eval_spatial_resolution = feature_extractor.eval_spatial_resolution

        logger.info(
            "Initializing memory: nn_method=%s, memory_size=%s, augmentation_epoch=%s",
            nn_method,
            str(memory_size),
            augmentation_epoch,
        )
        if memory_size is not None:
            if dataset_size is None:
                raise ValueError("dataset_size must be provided when memory_size is set.")
            denom = dataset_size * augmentation_epoch
            self.num_sampled_features = max(1, memory_size // max(1, denom))
            n_patches = eval_spatial_resolution * eval_spatial_resolution
            if self.num_sampled_features > n_patches:
                # More budget than patches exist: take every patch and let
                # the final trim shrink the bank (the reference's topk would
                # error here, hbird_eval.py:511).
                logger.warning(
                    "memory_size budgets %d patches/image but images only "
                    "have %d; clamping (bank will be trimmed).",
                    self.num_sampled_features,
                    n_patches,
                )
                self.num_sampled_features = n_patches
            logger.info(
                "Bounded memory: %d rows => %d sampled patches per image",
                memory_size,
                self.num_sampled_features,
            )
            self.feature_memory = np.zeros(
                (memory_size, feature_extractor.d_model), np.float32
            )
            self.label_memory = np.zeros((memory_size, num_classes), np.float32)

        self._aot = None
        if load_memory:
            # Restore a persisted bank/index instead of building from the
            # train_loader (.npy/.npz/.pt flat banks, .bankdir streamed
            # trees, .treedir serialized indexes). Falls back to a normal
            # build when the paths aren't on disk.
            with self.timer.phase("memory_build"):
                loaded = self.load_memory()
            if loaded:
                logger.info(
                    "Memory restored from disk; skipping the train build."
                )
                if aot_eval:
                    # Start the eval-step precompile now, against the
                    # RESTORED bank's exact row count — a caller doing
                    # any host work before evaluate() gets the compile
                    # for free; evaluate() itself just joins the thread
                    # (never slower than inline JIT).
                    try:
                        self._start_aot_eval(**{
                            **aot_eval,
                            "bank_rows": int(self.NN_algorithm.valid_rows),
                        })
                    except Exception as e:  # best-effort; evaluate JITs
                        logger.info("AOT eval-step precompile skipped: %s", e)
                return
            logger.warning(
                "load_memory=True but no persisted memory found at "
                "f_mem_p=%s / l_mem_p=%s; building from the train loader.",
                self.f_mem_p, self.l_mem_p,
            )
        if aot_eval:
            try:
                self._start_aot_eval(**aot_eval)
            except Exception as e:  # AOT is best-effort; evaluate() will JIT
                logger.info("AOT eval-step precompile skipped: %s", e)

        try:
            with self.timer.phase("memory_build"), maybe_trace("memory_build"):
                filled = self._create_memory(
                    train_loader,
                    num_classes=num_classes,
                    eval_spatial_resolution=eval_spatial_resolution,
                )
        except BaseException:
            # Don't let a crashing build abandon the in-flight AOT
            # compile: the caller typically exits on this exception, and
            # killing a remote Mosaic compile wedges the TPU tunnel.
            th = getattr(self, "_aot_thread", None)
            if th is not None and th.is_alive():
                th.join()
            raise
        if memory_size is not None and filled is not None and filled < memory_size:
            if getattr(self, "_bank_valid_rows", None) is not None:
                # Meshed device bank: stays padded/sharded; the short fill
                # is already masked through _bank_valid_rows.
                logger.info(
                    "Meshed memory filled %d of %d rows (masked, not "
                    "trimmed)", filled, memory_size,
                )
            else:
                logger.info("Trimming memory %d -> %d rows", memory_size, filled)
                self.feature_memory = self.feature_memory[:filled]
                self.label_memory = self.label_memory[:filled]

        self._save_memory()
        with self.timer.phase("index_build"):
            self._create_nn(
                self.n_neighbours, nn_method=self.nn_method, **self.nn_params
            )
        self._save_tree_if_requested()

    # ------------------------------------------------------------------
    # Memory construction
    # ------------------------------------------------------------------
    def _put_batch(self, x: np.ndarray):
        sharding = _batch_sharding(self.mesh)
        if sharding is None:
            return jnp.asarray(x)
        return jax.device_put(x, sharding)

    def _pad_target(self, n: int) -> int:
        """Compiled batch size: first-batch size rounded up so it divides
        evenly over the mesh's data axis."""
        d = self.mesh.shape.get("data", 1) if self.mesh is not None else 1
        return ((n + d - 1) // d) * d

    def _forward_fn(self):
        """(operand, imgs) -> (feats, attn) with backbone weights passed as
        a jit ARGUMENT — closing over large param pytrees would bake them
        into the compiled program as constants (and overflow the remote
        compiler's request limit for real backbones)."""
        fe = self.feature_extractor
        if hasattr(fe, "forward_features_pure"):
            return fe.forward_features_pure, getattr(fe, "pure_operand", None)
        return (lambda _operand, imgs: fe.forward_features(imgs)), None

    def _prep_images(self, imgs):
        """uint8 batches are normalized on-device: (x/255 - mean)/std —
        the host ships 4x less data (see transforms device_normalize)."""
        if imgs.dtype != jnp.uint8:
            return imgs
        if self._device_norm is not None:
            mean, std = self._device_norm
        else:
            from hbird_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

            mean, std = IMAGENET_MEAN, IMAGENET_STD
        mean = jnp.asarray(mean, jnp.float32).reshape(1, -1, 1, 1)
        std = jnp.asarray(std, jnp.float32).reshape(1, -1, 1, 1)
        return (imgs.astype(jnp.float32) / jnp.float32(255.0) - mean) / std

    @staticmethod
    def _mask_ids(masks):
        """Masks arrive either float id/255 (ToTensor convention) or raw
        uint8 class ids (device_normalize pipelines)."""
        if masks.dtype == jnp.uint8:
            return masks.astype(jnp.int32)
        return jnp.rint(masks * 255.0).astype(jnp.int32)

    def _make_memory_step(self):
        fe = self.feature_extractor
        num_classes = self.num_classes
        bounded = self.memory_size is not None
        k_samples = self.num_sampled_features
        fwd, _ = self._forward_fn()

        def step(imgs, masks, key, operand):
            # (B,1,H,W) mask -> int labels; 255 -> 0
            y = self._mask_ids(masks)
            y = jnp.where(y == 255, 0, y)
            feats, _ = fwd(operand, self._prep_images(imgs))  # (B, N, D)
            input_size = imgs.shape[-1]
            s = fe.eval_spatial_resolution
            patch_size = input_size // s
            pgt = patchify_gt(y, patch_size)  # (B, S, S, P)
            label = patch_soft_labels(pgt, num_classes)  # (B, S, S, C)
            if not bounded:
                normed = feats / jnp.linalg.norm(feats, axis=2, keepdims=True)
                return normed.reshape(-1, feats.shape[-1]), label.reshape(
                    -1, num_classes
                )
            sampled, idx = sample_patches(key, feats, pgt, num_classes, k_samples)
            normed = sampled / jnp.linalg.norm(sampled, axis=2, keepdims=True)
            lbl = label.reshape(label.shape[0], -1, num_classes)
            lbl = jnp.take_along_axis(lbl, idx[..., None].astype(jnp.int32), axis=1)
            return normed.reshape(-1, sampled.shape[-1]), lbl.reshape(-1, num_classes)

        if not getattr(fe, "jittable", True):
            return step
        return jax.jit(step)

    def _create_memory(
        self, train_loader, num_classes: int, eval_spatial_resolution: int
    ) -> Optional[int]:
        step = self._make_memory_step()
        bounded = self.memory_size is not None
        # Bounded banks accumulate ON DEVICE via a donated
        # dynamic_update_slice — feature slabs never round-trip to host
        # during the build (the reference pulls every batch to CPU,
        # hbird_eval.py:328-355). Unbounded banks may exceed HBM and go to
        # host. Mesh-sharded banks accumulate straight into a bank-axis-
        # sharded device array (the IndexShards analogue of Faiss per-GPU
        # index.add, reference search_faiss.py:78-81) — nothing O(bank)
        # lands on the host during a meshed build either.
        # Unbounded banks with a known dataset_size have a known final
        # size too (every image contributes S^2 rows per augmentation
        # epoch) and use the same donated-write accumulation — unlike a
        # final jnp.concatenate of chunks, peak HBM never doubles.
        expected_rows = None
        if not bounded and self._dataset_size:
            s2 = eval_spatial_resolution * eval_spatial_resolution
            expected_rows = self._dataset_size * s2 * self.augmentation_epoch
        accum_rows = self.memory_size if bounded else expected_rows
        # Multi-process meshes are out of scope for the device build:
        # _put_batch's device_put cannot target non-addressable devices.
        mesh_ok = self.mesh is None or jax.process_count() == 1
        device_capable = mesh_ok and getattr(
            self.feature_extractor, "jittable", True
        )
        device_accum = accum_rows is not None and device_capable
        # Unbounded banks of unknown size still stay device-resident when
        # device-capable (chunk list + one concatenate): pulling every
        # (rows, D) feature slab to host costs bank_bytes of host<->device
        # bandwidth (tens of seconds through a remote tunnel) for data the
        # NN index wants back on device anyway.
        device_chunks = not bounded and not device_accum and device_capable
        feature_chunks: List[np.ndarray] = []
        label_chunks: List[np.ndarray] = []
        idx = 0
        batch_size: Optional[int] = None
        t0 = time.time()
        self._bank_valid_rows = None

        if device_accum:
            alloc_rows = accum_rows
            bank_spec = None
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from hbird_tpu.parallel.sharded_knn import pad_rows_for_mesh

                # Rows padded so every bank shard is equal and aligned
                # (shard_map needs even shards); padded rows are masked
                # out of search via the backend's valid_rows. jnp.zeros
                # with an explicit sharding materializes each shard on
                # its own device — no full-size single-device transient.
                n_shards = self.mesh.shape.get("bank", 1)
                alloc_rows = pad_rows_for_mesh(accum_rows, n_shards)
                # Meshes WITHOUT a bank axis (pure data-parallel eval)
                # keep the bank replicated — P("bank") over a missing
                # axis raises. Padding still applies (block alignment);
                # the backend masks it via valid_rows.
                bank_spec = NamedSharding(
                    self.mesh,
                    P("bank" if "bank" in self.mesh.axis_names else None),
                )
            dev_feats = jnp.zeros(
                (alloc_rows, self.feature_extractor.d_model),
                jnp.float32, device=bank_spec,
            )
            dev_labels = jnp.zeros(
                (alloc_rows, self.num_classes), jnp.float32, device=bank_spec
            )

            @functools.partial(
                jax.jit, donate_argnums=(0,), out_shardings=bank_spec
            )
            def write_rows(bank, rows, start):
                # Donated: without it every write allocates a fresh
                # full-size bank while the old one is live (2x peak HBM —
                # an OOM at near-capacity banks the comments promise to
                # avoid). out_shardings pins the meshed accumulator to the
                # bank axis (data-sharded feature slabs reshard on write).
                return jax.lax.dynamic_update_slice(bank, rows, (start, 0))

        def consume(feats, labels, valid, bs):
            """Fold one finished step's output into the bank (may block on
            the device for host-bound paths)."""
            nonlocal idx, dev_feats, dev_labels, overflow_warned
            rows_per_img = feats.shape[0] // bs
            full_rows = valid * rows_per_img
            n_rows = min(full_rows, accum_rows - idx) \
                if accum_rows is not None else full_rows
            if not bounded and accum_rows is not None and n_rows < full_rows:
                # The loader yielded MORE rows than dataset_size *
                # S^2 * augmentation_epoch promised (repeating loader,
                # stale dataset_size, or a backbone with a different
                # token count). The reference accumulates everything
                # (hbird_eval.py:322-329), so the excess spills to host
                # chunks and is concatenated back after the build rather
                # than being dropped.
                if not overflow_warned:
                    overflow_warned = True
                    logger.warning(
                        "Unbounded memory overflow: the preallocated %d "
                        "rows are full but the loader keeps yielding; "
                        "excess rows spill to host-side accumulation. "
                        "Check dataset_size/augmentation_epoch.",
                        accum_rows,
                    )
                feature_chunks.append(
                    np.asarray(feats[n_rows:full_rows], np.float32)
                )
                label_chunks.append(
                    np.asarray(labels[n_rows:full_rows], np.float32)
                )
            if device_accum:
                # Full batches write in place (async dispatch, no host
                # sync); the (rare) ragged tail batch goes through one
                # extra-shape write_rows compile (meshed: keeps the rows
                # on device; unmeshed: host slice, as before).
                if n_rows == feats.shape[0]:
                    dev_feats = write_rows(dev_feats, feats, idx)
                    dev_labels = write_rows(dev_labels, labels, idx)
                elif n_rows > 0:
                    if self.mesh is not None:
                        dev_feats = write_rows(dev_feats, feats[:n_rows], idx)
                        dev_labels = write_rows(
                            dev_labels, labels[:n_rows], idx
                        )
                    else:
                        f_np = np.asarray(feats[:n_rows], np.float32)
                        l_np = np.asarray(labels[:n_rows], np.float32)
                        dev_feats = dev_feats.at[idx : idx + n_rows].set(f_np)
                        dev_labels = dev_labels.at[idx : idx + n_rows].set(l_np)
                idx += n_rows
                return
            if device_chunks:
                # Slicing is lazy/on-device; no host transfer here.
                feature_chunks.append(feats[:n_rows])
                label_chunks.append(labels[:n_rows])
                return
            feats_np = np.asarray(feats[:n_rows], np.float32)
            labels_np = np.asarray(labels[:n_rows], np.float32)
            if bounded:
                self.feature_memory[idx : idx + n_rows] = feats_np
                self.label_memory[idx : idx + n_rows] = labels_np
                idx += n_rows
            else:
                feature_chunks.append(feats_np)
                label_chunks.append(labels_np)

        # One-batch pipeline lag (same pattern as the eval loop): batch
        # i+1 is host-prepped, transferred, and DISPATCHED before batch i's
        # results are pulled to host, so device compute overlaps host
        # decode/augment/transfer instead of serializing behind it.
        in_flight = None
        if not device_accum:
            dev_feats = dev_labels = None
        overflow_warned = False
        n_imgs = 0
        for epoch in tqdm(range(self.augmentation_epoch), desc="Augmentation loop"):
            for x, y in tqdm(train_loader, desc="Memory creation loop", leave=False):
                x = _as_batch(x)
                y = _as_batch(y)
                if batch_size is None:
                    batch_size = self._pad_target(x.shape[0])
                x, valid = _pad_batch(x, batch_size)
                y, _ = _pad_batch(y, batch_size)
                self._key, sub = jax.random.split(self._key)
                feats, labels = step(
                    self._put_batch(x), self._put_batch(y), sub, self._fwd_operand
                )
                n_imgs += valid
                prev, in_flight = in_flight, (feats, labels, valid, batch_size)
                if prev is not None:
                    consume(*prev)
        if in_flight is not None:
            consume(*in_flight)
        self.timer.add_items("memory_build", n_imgs)

        if device_accum:
            if self.mesh is not None:
                # The meshed accumulator is PADDED to even shards; padded
                # (and unfilled) rows are masked out of search through the
                # backend's valid_rows instead of sliced off — slicing a
                # bank-sharded array to an uneven size lets GSPMD pick the
                # output sharding (worst case fully replicated = O(bank)
                # per-device HBM).
                if not bounded and feature_chunks:
                    # Overflow spill (misconfigured dataset_size): fold the
                    # host excess into the padding headroom if it fits,
                    # else fall back to concatenate + re-place (rare,
                    # correctness over placement).
                    spill_f = np.concatenate(feature_chunks)
                    spill_l = np.concatenate(label_chunks)
                    room = dev_feats.shape[0] - idx
                    if spill_f.shape[0] <= room:
                        dev_feats = write_rows(
                            dev_feats, jnp.asarray(spill_f), idx
                        )
                        dev_labels = write_rows(
                            dev_labels, jnp.asarray(spill_l), idx
                        )
                        idx += spill_f.shape[0]
                    else:
                        dev_feats = jnp.concatenate(
                            [jnp.asarray(np.asarray(dev_feats)[:idx]),
                             jnp.asarray(spill_f)]
                        )
                        dev_labels = jnp.concatenate(
                            [jnp.asarray(np.asarray(dev_labels)[:idx]),
                             jnp.asarray(spill_l)]
                        )
                        idx = dev_feats.shape[0]
                self._bank_valid_rows = idx
            elif not bounded and idx < accum_rows:
                # Loader yielded fewer images than dataset_size promised.
                dev_feats = dev_feats[:idx]
                dev_labels = dev_labels[:idx]
            if self.mesh is None and not bounded and feature_chunks:
                # Overflow spill (see consume): fold the host-accumulated
                # excess back in so no training rows are lost.
                dev_feats = jnp.concatenate(
                    [dev_feats, jnp.asarray(np.concatenate(feature_chunks))]
                )
                dev_labels = jnp.concatenate(
                    [dev_labels, jnp.asarray(np.concatenate(label_chunks))]
                )
                idx = dev_feats.shape[0]
            self.feature_memory = dev_feats
            self.label_memory = dev_labels
            logger.info(
                "%s memory filled rows: %d (device-resident, %.1fs)",
                "Bounded" if bounded else "Unbounded",
                idx,
                time.time() - t0,
            )
            return idx

        if not bounded:
            cat = jnp.concatenate if device_chunks else np.concatenate
            self.feature_memory = (
                cat(feature_chunks)
                if feature_chunks
                else np.zeros((0, self.feature_extractor.d_model), np.float32)
            )
            self.label_memory = (
                cat(label_chunks)
                if label_chunks
                else np.zeros((0, num_classes), np.float32)
            )
            logger.info(
                "Unbounded memory created: %d x %d rows in %.1fs",
                self.feature_memory.shape[0],
                self.feature_memory.shape[1],
                time.time() - t0,
            )
            return self.feature_memory.shape[0]
        logger.info("Bounded memory filled rows: %d (%.1fs)", idx, time.time() - t0)
        return idx

    # ------------------------------------------------------------------
    # Persistence (reference hbird_eval.py:371-400)
    # ------------------------------------------------------------------
    def _memory_for_save(self, memory):
        """Persisted banks carry only the real rows: a padded meshed bank
        is trimmed through a per-chunk host view (saving is host IO
        anyway; a device-side uneven slice could replicate O(bank))."""
        valid = self._bank_valid_rows
        if valid is None or memory is None or memory.shape[0] == valid:
            return memory

        class _TrimView:
            __slots__ = ("_a", "shape", "dtype")

            def __init__(self, a, rows):
                self._a = a
                self.shape = (rows,) + tuple(a.shape[1:])
                self.dtype = a.dtype

            def __getitem__(self, s):
                return self._a[s]

            def __array__(self, dtype=None):
                # Full host gather THEN trim (flat saves are whole-array
                # host IO anyway; a device-side uneven slice could
                # replicate the padded bank per device).
                out = np.asarray(self._a)[: self.shape[0]]
                return out if dtype is None else out.astype(dtype)

        return _TrimView(memory, valid)

    def _save_memory(self) -> None:
        from hbird_tpu.bank.io import is_tree_path, save_memory

        if self.f_mem_p is not None and not is_tree_path(self.f_mem_p):
            # '.treedir' paths save the BUILT index instead, which only
            # exists after _create_nn — deferred to
            # _save_tree_if_requested() in __init__. The label save below
            # is independent and never skipped.
            # save_memory may append '.npy'; keep the real path so a later
            # load_memory() on this instance finds it.
            self.f_mem_p = save_memory(
                self._memory_for_save(self.feature_memory), self.f_mem_p
            )
            logger.info("Saved feature memory to: %s", self.f_mem_p)
        if self.l_mem_p is not None:
            self.l_mem_p = save_memory(
                self._memory_for_save(self.label_memory), self.l_mem_p
            )
            logger.info("Saved label memory to: %s", self.l_mem_p)

    def _save_tree_if_requested(self) -> None:
        """f_mem_p ending in '.treedir' serializes the BUILT IVF index
        (ScaNN searcher-serialization parity): reloading skips k-means +
        layout + scatter entirely (load_memory / load_tree)."""
        from hbird_tpu.bank.io import is_tree_path

        if self.f_mem_p is None or not is_tree_path(self.f_mem_p):
            return
        if not getattr(self.NN_algorithm, "use_tree", False):
            # Don't lose the (possibly expensive) memory build: persist
            # the flat memory instead, under an explicit '.npy' suffix.
            from hbird_tpu.bank.io import save_memory

            fallback = save_memory(self.feature_memory, self.f_mem_p + ".flat")
            logger.warning(
                "f_mem_p=%s requests a tree save but the backend is not a "
                "tree (nn_method=%s); saved the FLAT feature memory to %s "
                "instead. Use nn_method='ivf' for a tree, or a "
                "'.npy/.bankdir' path for flat banks.",
                self.f_mem_p, self.nn_method, fallback,
            )
            return
        self.NN_algorithm.save_tree(self.f_mem_p)
        logger.info("Saved built tree index to: %s", self.f_mem_p)

    def load_memory(self) -> bool:
        """Load previously saved memories (supports .npy/.npz and torch .pt —
        the strict-parity injection hook for reference-built banks)."""
        from hbird_tpu.bank.io import load_memory, memory_path_on_disk, tree_path_on_disk

        if self.f_mem_p is not None and tree_path_on_disk(self.f_mem_p):
            # Saved BUILT tree: self-contained (slabs + labels + layout),
            # l_mem_p unused. Search-time nn-params pass through.
            search_keys = (
                "num_leaves_to_search", "recall_target", "query_block",
                "shard_probe", "num_reordering_candidates",
            )
            kwargs = {
                k: v for k, v in self.nn_params.items() if k in search_keys
            }
            self.NN_algorithm = NearestNeighborSearchApprox.load_tree(
                self.f_mem_p,
                n_neighbors=self.n_neighbours,
                mesh=self.mesh,
                **kwargs,
            )
            self.feature_memory = None
            self.label_memory = None
            logger.info("Loaded built tree index from: %s", self.f_mem_p)
            if (
                kwargs.get("recall_target") is not None
                and "num_leaves_to_search" not in kwargs
            ):
                self._calibrate_probe_safely()
            return True

        if (
            self.f_mem_p is not None
            and self.l_mem_p is not None
            and memory_path_on_disk(self.f_mem_p) is not None
            and memory_path_on_disk(self.l_mem_p) is not None
        ):
            from hbird_tpu.bank.io import is_sharded_path

            if (
                (self.nn_method == "ivf" or self.nn_params.get("use_tree"))
                and is_sharded_path(self.f_mem_p)
                and is_sharded_path(self.l_mem_p)
            ):
                # .bankdir + tree backend: build STREAMED straight from
                # disk windows (ops/ivf.build_tree_streamed) — the flat
                # bank never exists in host RAM or HBM (at 10M+ rows it
                # cannot coexist with the slab layout on a 16 GB chip).
                # With a mesh each window scatters to its owning shard,
                # so >single-shard banks stream straight onto the mesh.
                _, kwargs = self._nn_cls_kwargs("ivf", **self.nn_params)
                kwargs.pop("use_tree", None)
                kwargs.pop("use_fp16", None)
                kwargs.pop("mesh", None)
                self.NN_algorithm = NearestNeighborSearchApprox.from_bankdir(
                    self.f_mem_p,
                    self.l_mem_p,
                    n_neighbors=self.n_neighbours,
                    mesh=self.mesh,
                    **kwargs,
                )
                self.feature_memory = None
                self.label_memory = None
                logger.info(
                    "Loaded .bankdir memory via the streamed tree build."
                )
                # recall_target applies on this path too (the CLI help
                # promises a MEASURED probe count; the streamed load is
                # exactly the north-star-scale case where it matters).
                if (
                    kwargs.get("recall_target") is not None
                    and "num_leaves_to_search" not in kwargs
                ):
                    self._calibrate_probe_safely()
                return True
            self.feature_memory = load_memory(self.f_mem_p)
            self.label_memory = load_memory(self.l_mem_p)
            self._create_nn(self.n_neighbours, nn_method=self.nn_method, **self.nn_params)
            logger.info("Loaded memory from disk.")
            return True
        logger.warning("Memory files not found or paths not provided; skipping load.")
        return False

    # ------------------------------------------------------------------
    # NN backend
    # ------------------------------------------------------------------
    def _nn_cls_kwargs(self, nn_method: str, **kwargs):
        """Resolve the backend class + effective kwargs (shared by the real
        index build and the AOT dummy so both trace the same program)."""
        method = _NN_ALIASES.get(nn_method, nn_method)
        cls = (
            NearestNeighborSearchApprox
            if method in ("approx", "ivf")
            else NearestNeighborSearchExact
        )
        if method == "ivf":
            kwargs.setdefault("use_tree", True)
        # exact: bf16 bank tracks the engine flag (faiss useFloat16
        # semantics); approx: bf16 by default (ScaNN's default scoring is
        # quantized; measured recall@30 0.9998 — scripts/bench_backends.py).
        kwargs.setdefault(
            "use_fp16",
            self.bf16_bank or cls is NearestNeighborSearchApprox,
        )
        return cls, kwargs

    def _create_nn(self, n_neighbours: int = 30, nn_method: str = "exact", **kwargs):
        logger.info("Building NN index: method=%s, k=%d", nn_method, n_neighbours)
        explicit_recall = kwargs.get("recall_target") is not None
        explicit_probe = "num_leaves_to_search" in kwargs
        cls, kwargs = self._nn_cls_kwargs(nn_method, **kwargs)
        if getattr(self, "_bank_valid_rows", None) is not None:
            # Meshed device-accumulated bank: feature_memory rows are
            # padded to even shards; tell the backend the real count so
            # padding never surfaces as ghost neighbours. (getattr:
            # injection paths construct the engine via __new__.)
            kwargs.setdefault("valid_rows", self._bank_valid_rows)
        self.NN_algorithm = cls(
            self.feature_memory,
            n_neighbors=n_neighbours,
            mesh=self.mesh,
            label_memory=self.label_memory,
            **kwargs,
        )
        # Tree mode + an explicit recall_target (and no explicit probe
        # count): pick num_leaves_to_search by measurement — the ScaNN
        # recall-tuned builder. Safe with the background AOT compile:
        # _take_aot_step declines executables whose baked probe count no
        # longer matches. Meshed trees calibrate through the real sharded
        # search path (shard_probe semantics included).
        if (
            getattr(self.NN_algorithm, "use_tree", False)
            and explicit_recall
            and not explicit_probe
        ):
            self._calibrate_probe_safely()

    def _calibrate_probe_safely(self) -> None:
        """Run probe-count calibration WITHOUT overlapping the background
        AOT compile: concurrent first-compiles through the remote tunnel
        starve each other (CLAUDE.md), so join any in-flight AOT thread
        first. (_start_aot_eval skips entirely when calibration is
        planned; this join is the safety net for other code paths.)"""
        th = getattr(self, "_aot_thread", None)
        if th is not None and th.is_alive():
            logger.info(
                "Waiting for the in-flight AOT eval compile before probe "
                "calibration (never overlap fresh remote compiles)."
            )
            th.join()
        self.NN_algorithm.calibrate_n_probe(self.NN_algorithm.recall_target)

    # ------------------------------------------------------------------
    # Ahead-of-time eval-step compilation (overlaps the memory build)
    # ------------------------------------------------------------------
    def _start_aot_eval(
        self,
        batch_size: int,
        input_size: int,
        ignore_index: int = 255,
        img_dtype=np.uint8,
        mask_dtype=np.uint8,
        return_knn_details: bool = False,
        bank_rows: Optional[int] = None,
    ) -> None:
        """Compile the fused eval step in a background thread WHILE the
        memory build streams, hiding the XLA/Mosaic compile (tens of
        seconds through a remote compiler) behind the build phase.

        Valid because the eval step is pure over (imgs, masks, operand,
        nn_state): a backend constructed with the real CONFIG but a dummy
        2-row bank traces the identical program once its `valid_rows` and
        state avals are pinned to the expected bank size — every
        value-dependent quantity (bank, labels, int8 scale) flows through
        the state argument. `evaluate` picks the executable up when the
        first real batch's avals match; any mismatch (e.g. a trimmed
        bounded bank) silently falls back to the jitted path.
        """
        import threading

        if self.mesh is not None or not getattr(
            self.feature_extractor, "jittable", True
        ):
            return
        if self.nn_params.get("probe_mode") == "query":
            # Per-query probing runs the eval step eagerly (host-side
            # leaf grouping) — there is no jitted step to precompile.
            return
        if self.nn_params.get("idx_shard") or self.nn_params.get("devices"):
            # Backend-internal meshes shard the state; the AOT executable
            # would be placement-incompatible. Let those JIT.
            return
        if return_knn_details:
            return  # the details path is a debugging surface; let it JIT
        rows = bank_rows if bank_rows is not None else self.memory_size
        if rows is None:
            if not self._dataset_size:
                return  # unbounded bank of unknown final size
            s2 = self.feature_extractor.eval_spatial_resolution ** 2
            rows = self._dataset_size * s2 * self.augmentation_epoch
        rows = int(rows)
        d = self.feature_extractor.d_model
        cls, kwargs = self._nn_cls_kwargs(self.nn_method, **self.nn_params)
        if (
            kwargs.get("use_tree")
            and self.nn_params.get("recall_target") is not None
            and "num_leaves_to_search" not in self.nn_params
        ):
            # calibrate_n_probe will re-pick the probe count after the
            # build: an executable baked with the default would be
            # discarded, and its in-flight remote compile would overlap
            # calibration's fresh compiles (never overlap fresh compiles
            # through the tunnel — CLAUDE.md). Let evaluate() JIT.
            logger.info(
                "Skipping the AOT eval compile: recall_target calibration "
                "will change the probe count after the build."
            )
            return
        dummy = cls(
            np.zeros((2, d), np.float32),
            n_neighbors=self.n_neighbours,
            label_memory=np.zeros((2, self.num_classes), np.float32),
            **kwargs,
        )
        dummy.pin_expected_rows(rows)
        esr = self.feature_extractor.eval_spatial_resolution
        step = self._make_eval_step(
            esr, ignore_index, return_knn_details, nn=dummy
        )
        b = self._pad_target(batch_size)
        specs = (
            jax.ShapeDtypeStruct((b, 3, input_size, input_size), np.dtype(img_dtype)),
            jax.ShapeDtypeStruct((b, 1, input_size, input_size), np.dtype(mask_dtype)),
            jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype),
                self._fwd_operand,
            ),
            dummy.state_spec(rows),
        )
        holder: Dict[str, Any] = {}

        def work():
            try:
                t0 = time.time()
                holder["compiled"] = step.lower(*specs).compile()
                logger.info(
                    "AOT eval-step compile finished in %.1fs", time.time() - t0
                )
            except Exception as e:  # evaluate() falls back to JIT
                holder["error"] = e
                logger.info("AOT eval-step compile failed (will JIT): %s", e)

        th = threading.Thread(target=work, name="hbird-aot-eval", daemon=True)
        th.start()
        # Kept beyond _take_aot_step so evaluate() can join before the
        # process can exit: killing an in-flight remote Mosaic compile
        # wedges the TPU tunnel for minutes (CLAUDE.md).
        self._aot_thread = th
        self._aot = {
            "thread": th,
            "holder": holder,
            "specs": specs,
            "esr": esr,
            "ignore_index": ignore_index,
            "return_knn_details": return_knn_details,
            # Static config baked into the compiled program beyond what
            # avals capture: a later calibrate_n_probe() changes the
            # probe count without changing any shape, and the stale
            # executable must be declined.
            "n_probe": getattr(dummy, "num_leaves_to_search", None),
        }
        logger.info(
            "AOT eval-step compile started in background "
            "(bank rows=%d, batch=%d, input=%d)",
            rows,
            b,
            input_size,
        )

    def _take_aot_step(self, imgs, masks, esr: int, ignore_index,
                       return_knn_details: bool):
        """Return the precompiled eval step if its avals match the first
        real batch + live state; None -> caller keeps the jitted path."""
        aot, self._aot = getattr(self, "_aot", None), None  # one-shot
        if not aot:
            return None
        if (
            aot["esr"] != esr
            or aot["ignore_index"] != ignore_index
            or aot["return_knn_details"] != return_knn_details
        ):
            return None
        live_probe = getattr(self.NN_algorithm, "num_leaves_to_search", None)
        if aot["n_probe"] != live_probe:
            logger.info(
                "AOT eval step unused (probe count changed %s -> %s, e.g. "
                "calibrate_n_probe); falling back to JIT",
                aot["n_probe"], live_probe,
            )
            return None

        def sig(tree):
            leaves, treedef = jax.tree_util.tree_flatten(tree)
            return treedef, [
                (tuple(leaf.shape), np.dtype(leaf.dtype)) for leaf in leaves
            ]

        actual = sig(
            (imgs, masks, self._fwd_operand, self.NN_algorithm.device_state)
        )
        wanted = sig(aot["specs"])
        if actual != wanted:
            logger.info(
                "AOT eval step unused (aval mismatch); falling back to JIT"
            )
            return None
        # Same compile we would otherwise pay inline, so an unconditional
        # join is never slower than the fallback.
        aot["thread"].join()
        compiled = aot["holder"].get("compiled")
        if compiled is None:
            return None
        logger.info("Using AOT-compiled eval step")
        self._aot_used = True  # breadcrumb for tests/diagnostics
        return compiled

    def _uses_pallas_carry(self) -> bool:
        """Is the eval step's retrieval the fused Pallas exact kernel with
        the (compile-lottery-prone) default merge mode?"""
        from hbird_tpu.ops import knn_pallas

        nn = self.NN_algorithm
        return (
            isinstance(nn, NearestNeighborSearchExact)
            and getattr(nn, "kernel", None) == "pallas"
            and knn_pallas.default_merge_mode() == "carry"
        )

    def _budgeted_first_compile(self, step, step_cfg, args):
        """Dispatch the first eval batch under a compile budget.

        The remote Mosaic compiler is a lottery (the same carry-merge
        kernel has compiled in 2s and in 1363s); when the AOT thread has
        not delivered and the inline compile exceeds the budget, flip the
        PROCESS default merge mode to 'carry_lazy' (identical semantics,
        reliably fast compiles, ~4% slower steady-state) and retrace. The
        abandoned compile keeps running in a daemon thread and is joined
        at teardown (killing it mid-remote-compile wedges the tunnel).

        Budget: HBIRD_COMPILE_BUDGET seconds (default 180; <= 0
        disables). Only engaged for the pallas 'carry' exact path — every
        other backend compiles dependably.
        """
        try:
            budget = float(os.environ.get("HBIRD_COMPILE_BUDGET", 180.0))
        except ValueError:
            budget = 180.0
        if budget <= 0 or not self._uses_pallas_carry():
            return step, None
        if not getattr(self.feature_extractor, "jittable", True):
            return step, None

        import threading

        from hbird_tpu.ops import knn_pallas

        done = threading.Event()
        box: Dict[str, Any] = {}

        def work():
            try:
                out = step(*args)
                jax.block_until_ready(out)
                box["out"] = out
            except Exception:  # noqa: BLE001 — main thread recompiles anyway
                logger.exception("Budgeted first compile thread failed")
            finally:
                done.set()

        th = threading.Thread(
            target=work, name="hbird-first-compile", daemon=True
        )
        t0 = time.time()
        th.start()
        if done.wait(budget):
            # Compiled in budget; hand the already-computed first batch
            # back so the caller doesn't re-dispatch it.
            return step, box.get("out")
        logger.warning(
            "Eval-step compile exceeded the %.0fs budget "
            "(HBIRD_COMPILE_BUDGET); falling back to merge_mode="
            "'carry_lazy' for this process (identical results, ~4%% "
            "slower steady-state). The original compile continues in the "
            "background.",
            budget,
        )
        knn_pallas.set_default_merge_mode("carry_lazy")
        self._fallback_thread = th  # joined in evaluate()'s teardown
        self._compile_fallback_used = True  # breadcrumb for tests
        step2 = self._make_eval_step(*step_cfg)
        logger.info(
            "carry compile abandoned after %.0fs; carry_lazy retrace "
            "started", time.time() - t0,
        )
        return step2, None

    def _find_nearest_key_to_query(self, q) -> Tuple[np.ndarray, np.ndarray]:
        """Retrieve neighbour features and labels for query patches.

        API-parity helper (reference hbird_eval.py:611-637): q is (B, N, D)
        and NOT normalized; returns host arrays
        (key_features (B,N,k,D), key_labels (B,N,k,C)). The fused engine
        path does not use this — it transfers only scores and labels.
        """
        q = jnp.asarray(np.asarray(q, np.float32))
        b, n, d = q.shape
        vals, idx, labels = self.NN_algorithm.search_with_labels(
            q.reshape(-1, d), self.n_neighbours
        )
        # Gather from the full-precision feature memory (reference
        # hbird_eval.py:632-637 indexes self.feature_memory), not the
        # backend's possibly bf16/int8-quantized scan bank. Streamed
        # .bankdir loads keep no flat memory — gather from the backend's
        # store (its precision) instead.
        if self.feature_memory is not None:
            key_features = jnp.take(
                jnp.asarray(self.feature_memory), idx, axis=0
            ).astype(jnp.float32)
        else:
            key_features = self.NN_algorithm.gather_features_pure(
                self.NN_algorithm.device_state, jnp.asarray(idx)
            ).astype(jnp.float32)
        k = self.n_neighbours
        return (
            np.asarray(key_features).reshape(b, n, k, -1),
            np.asarray(labels).reshape(b, n, k, -1),
        )

    # ------------------------------------------------------------------
    # Evaluation
    # ------------------------------------------------------------------
    def _make_eval_step(self, eval_spatial_resolution: int, ignore_index: int,
                        return_knn_details: bool, nn=None):
        fe = self.feature_extractor
        # `nn` is only consulted for CONFIG (k, kernel, block sizes, rerank
        # setup); all value state flows through the `nn_state` argument —
        # which is what makes AOT compilation against a dummy-config
        # backend valid (see _start_aot_eval).
        nn = nn if nn is not None else self.NN_algorithm
        num_classes = self.num_classes
        k = self.n_neighbours
        fwd, _ = self._forward_fn()

        def step(imgs, masks, operand, nn_state):
            b, _, h, w = imgs.shape
            s = eval_spatial_resolution
            feats, _ = fwd(operand, self._prep_images(imgs))  # (B, N, D)
            d = feats.shape[-1]
            q = feats.reshape(-1, d)
            vals, idx, labels = nn.search_with_labels_pure(
                nn_state, q, k
            )  # (Q,k),(Q,k),(Q,k,C)
            q_norm = jnp.linalg.norm(q, axis=-1)
            label_hat = cross_attention_from_scores(
                vals.reshape(b, -1, k),
                q_norm.reshape(b, -1),
                labels.reshape(b, -1, k, num_classes),
            )  # (B, N, C)
            lh = label_hat.reshape(b, s, s, num_classes).transpose(0, 3, 1, 2)
            resized = jax.image.resize(
                lh, (b, num_classes, h, w), method="bilinear", antialias=False
            )
            pred = jnp.argmax(resized, axis=1)  # (B, H, W)
            y = self._mask_ids(masks).reshape(b, h, w)
            conf = confusion_matrix(y, pred, num_classes, num_classes, ignore_index)
            if num_classes <= 255:
                # Class ids (and the 255 ignore sentinel) fit in uint8 —
                # quarters the per-batch device->host result transfer.
                pred = pred.astype(jnp.uint8)
                y = jnp.clip(y, 0, 255).astype(jnp.uint8)
            if return_knn_details:
                key_feats = nn.gather_features_pure(nn_state, idx).astype(
                    jnp.float32
                )
                return conf, pred, y, (key_feats.reshape(b, -1, k, d),
                                       labels.reshape(b, -1, k, num_classes),
                                       label_hat)
            return conf, pred, y, None

        # Eager escape hatches: live torch backbones, and NN backends
        # whose search is host-orchestrated (per-query IVF probing).
        if not getattr(fe, "jittable", True) or not getattr(
            nn, "jittable", True
        ):
            return step
        return jax.jit(step)

    def evaluate(
        self,
        val_loader,
        eval_spatial_resolution: int,
        return_knn_details: bool = False,
        ignore_index: int = 255,
    ):
        """Score the validation loader; returns mIoU (and optional details).

        Matches reference `evaluate` (hbird_eval.py:184-265): Hungarian
        matching via PredsmIoU.compute(is_global_zero=True).
        """
        metric = PredsmIoU(self.num_classes, self.num_classes, ignore_index=ignore_index)
        step = self._make_eval_step(eval_spatial_resolution, ignore_index, return_knn_details)

        knns, knns_labels, knns_ca_labels = [], [], []
        batch_size: Optional[int] = None
        logger.info("Starting evaluation loop...")
        t0 = time.time()
        n_imgs = 0
        eval_phase = self.timer.phase("evaluate")
        eval_phase.__enter__()
        eval_trace = maybe_trace("evaluate")
        eval_trace.__enter__()

        def consume(item):
            nonlocal n_imgs
            conf, pred, y_ids, details, valid = item
            n_imgs += valid
            conf_np = np.asarray(conf, np.int64)
            pred_np = np.asarray(pred)[:valid]
            y_np = np.asarray(y_ids)[:valid]
            # Masked pred stream for reordered_preds (reference parity).
            mask = (
                (y_np >= 0)
                & (y_np < self.num_classes)
                & (pred_np >= 0)
                & (pred_np < self.num_classes)
            )
            if ignore_index is not None:
                mask &= y_np != ignore_index
            metric.update_with_conf_mat(conf_np, pred=pred_np[mask])
            if return_knn_details and details is not None:
                kf, kl, ca = details
                knns.append(np.asarray(kf)[:valid])
                knns_labels.append(np.asarray(kl)[:valid])
                knns_ca_labels.append(np.asarray(ca)[:valid])

        # One-batch pipeline lag: batch i+1 is dispatched (async) before
        # batch i's results are pulled to host, overlapping device compute
        # and host decode/transfer.
        timing = os.environ.get("HBIRD_EVAL_TIMING")
        t_prev = time.perf_counter()
        in_flight = None
        aot_checked = False
        precomputed = None
        try:
            for x, y in tqdm(val_loader, desc="Evaluation loop"):
                if timing:
                    t_host = time.perf_counter()
                    logger.info("[t] host feed: %.3fs", t_host - t_prev)
                x = _as_batch(x)
                y = _as_batch(y)
                if batch_size is None:
                    batch_size = self._pad_target(x.shape[0])
                x, valid = _pad_batch(x, batch_size)
                # Padded images: force all-ignore GT so they don't touch the metric.
                ign = ignore_index if ignore_index is not None else 255
                if y.dtype == np.uint8:
                    y_pad = np.full((batch_size,) + y.shape[1:], ign, np.uint8)
                else:
                    y_pad = np.full(
                        (batch_size,) + y.shape[1:], ign / 255.0, np.float32
                    )
                y_pad[:valid] = y
                xb = self._put_batch(x)
                yb = self._put_batch(y_pad)
                if not aot_checked:
                    aot_checked = True
                    alt = self._take_aot_step(
                        xb, yb, eval_spatial_resolution, ignore_index,
                        return_knn_details,
                    )
                    if alt is not None:
                        step = alt
                    else:
                        step, precomputed = self._budgeted_first_compile(
                            step,
                            (eval_spatial_resolution, ignore_index,
                             return_knn_details),
                            (xb, yb, self._fwd_operand,
                             self.NN_algorithm.device_state),
                        )
                if precomputed is not None:
                    # The budget thread already ran this exact batch.
                    conf, pred, y_ids, details = precomputed
                    precomputed = None
                else:
                    conf, pred, y_ids, details = step(
                        xb,
                        yb,
                        self._fwd_operand,
                        self.NN_algorithm.device_state,
                    )
                if timing:
                    t_disp = time.perf_counter()
                    logger.info("[t] pad+put+dispatch: %.3fs", t_disp - t_host)
                if in_flight is not None:
                    consume(in_flight)
                if timing:
                    logger.info("[t] consume prev: %.3fs", time.perf_counter() - t_disp)
                    t_prev = time.perf_counter()
                in_flight = (conf, pred, y_ids, details, valid)
            if in_flight is not None:
                consume(in_flight)
        finally:
            # Exception-safe teardown: a crashing batch must not leave the
            # jax.profiler trace open (a later phase would raise
            # 'profiler is already active') or abandon an in-flight AOT
            # compile (process exit mid-remote-compile wedges the tunnel).
            eval_trace.__exit__(None, None, None)
            eval_phase.__exit__(None, None, None)
            for attr, what in (
                ("_aot_thread", "unused AOT compile"),
                ("_fallback_thread", "abandoned carry compile"),
            ):
                th = getattr(self, attr, None)
                if th is not None and th.is_alive():
                    logger.info("Waiting for the %s to finish...", what)
                    th.join()
        self.timer.add_items("evaluate", n_imgs)
        dt = time.time() - t0
        logger.info(
            "Evaluation loop done: %d images in %.1fs (%.2f img/s)",
            n_imgs,
            dt,
            n_imgs / max(dt, 1e-9),
        )
        with self.timer.phase("metric_compute"):
            # return_reordered=False: the engine (like the reference's
            # evaluate, hbird_eval.py:253) only consumes jac — remapping
            # the ~16M-pixel pred stream would cost seconds for nothing.
            # Multi-process runs (each process scoring its own val shard)
            # allgather-sum the confusion matrices first — the working
            # version of the reference's dormant DDP all_reduce hook
            # (eval_metrics.py:250-252); every process then computes the
            # identical global mIoU.
            jac, tp, fp, fn, reordered_preds, matched_bg_clusters = metric.compute(
                is_global_zero=True, return_reordered=False,
                sync_distributed=jax.process_count() > 1,
            )
        if return_knn_details:
            details_out = {
                "knns": np.concatenate(knns) if knns else np.zeros((0,)),
                "knns_labels": np.concatenate(knns_labels) if knns_labels else np.zeros((0,)),
                "knns_ca_labels": np.concatenate(knns_ca_labels)
                if knns_ca_labels
                else np.zeros((0,)),
            }
            logger.info("Evaluation complete (with KNN details).")
            return jac, details_out
        logger.info("Evaluation complete.")
        return jac


def hbird_evaluation(
    model,
    d_model: int,
    patch_size: int,
    dataset_name: str,
    data_dir: str,
    batch_size: int = 64,
    input_size: int = 224,
    augmentation_epoch: int = 1,
    device: str = "tpu",
    return_knn_details: bool = False,
    n_neighbours: int = 30,
    nn_method: str = "scann",
    nn_params: Optional[Dict[str, Any]] = None,
    ftr_extr_fn=None,
    memory_size: Optional[int] = None,
    num_workers: int = 8,
    ignore_index: int = 255,
    train_fs_path: Optional[str] = None,
    val_fs_path: Optional[str] = None,
    *,
    mesh=None,
    seed: int = 123,
    bf16_bank: bool = False,
    bf16_model: bool = False,
    f_mem_p: Optional[str] = None,
    l_mem_p: Optional[str] = None,
    load_memory: bool = False,
    loader_mode: str = "thread",
    device_normalize: bool = True,
):
    """High-level one-call evaluation (signature parity with reference
    hbird_eval.py:640-722, plus TPU keyword-only extras).

    device_normalize (default True): the host feed ships uint8 images and
    class-id masks; (x/255 - mean)/std runs on-device inside the jitted
    steps. 4x less host->device traffic (usually the memory-build
    bottleneck), numerically the same formula in f32. Set False to feed
    pre-normalized float batches (the reference's convention).

    Unlike the reference wrapper (which never forwards the persistence
    paths, hbird_eval.py:701-712), f_mem_p/l_mem_p are accepted here and
    passed through so one-call users get bank save/restore too.
    load_memory=True restores the persisted bank/index (flat .npy/.npz/
    .pt, streamed .bankdir, serialized .treedir) instead of building
    from the train loader — falling back to a build when nothing is on
    disk yet, so the same command warms the cache on first run.

    `model` may be:
    - an hbird_tpu (ViT, params) tuple, used with FeatureExtractor;
    - any object, if `ftr_extr_fn(model, imgs) -> (B, N, D)` is given
      (the reference's pluggable protocol, README.md:147);
    - an existing FeatureExtractor / FeatureExtractorSimple.
    """
    from hbird_tpu.data import get_dataset
    from hbird_tpu.data.transforms import (
        get_hbird_train_transforms,
        get_hbird_val_transforms,
    )

    eval_spatial_resolution = input_size // patch_size

    if isinstance(model, (FeatureExtractor, FeatureExtractorSimple)):
        feature_extractor = model
    elif ftr_extr_fn is None:
        vit, params = model
        params = vit.prepare_params(params, input_size)
        feature_extractor = FeatureExtractor(
            vit,
            params,
            eval_spatial_resolution=eval_spatial_resolution,
            d_model=d_model,
            use_bf16=bf16_model,
        )
    else:
        feature_extractor = FeatureExtractorSimple(
            model,
            ftr_extr_fn=ftr_extr_fn,
            eval_spatial_resolution=eval_spatial_resolution,
            d_model=d_model,
        )

    train_transforms = get_hbird_train_transforms(
        input_size, device_normalize=device_normalize
    )
    val_transforms = get_hbird_val_transforms(
        input_size, device_normalize=device_normalize
    )

    dataset, ignore_index_local = get_dataset(
        dataset_name,
        data_dir,
        batch_size,
        num_workers,
        train_transforms,
        val_transforms,
        train_fs_path,
        val_fs_path,
        loader_mode=loader_mode,
    )
    dataset_size = dataset.get_train_dataset_size()
    num_classes = dataset.get_num_classes()
    train_loader = dataset.train_dataloader()
    val_loader = dataset.val_dataloader()

    # Dataset-local ignore_index wins unless the caller overrides with a
    # non-default value (reference hbird_eval.py:714-715).
    effective_ignore = ignore_index if ignore_index != 255 else ignore_index_local

    evaluator = HbirdEvaluation(
        feature_extractor,
        train_loader,
        num_classes=num_classes,
        n_neighbours=n_neighbours,
        augmentation_epoch=augmentation_epoch,
        device=device,
        nn_method=nn_method,
        nn_params=nn_params,
        memory_size=memory_size,
        dataset_size=dataset_size,
        f_mem_p=f_mem_p,
        l_mem_p=l_mem_p,
        load_memory=load_memory,
        mesh=mesh,
        seed=seed,
        bf16_bank=bf16_bank,
        device_norm=train_transforms.get("device_norm"),
        # Pre-compile the eval step during the memory build (hides the
        # remote XLA/Mosaic compile behind the build phase).
        aot_eval=dict(
            batch_size=batch_size,
            input_size=input_size,
            ignore_index=effective_ignore,
            img_dtype=np.uint8 if device_normalize else np.float32,
            mask_dtype=np.uint8 if device_normalize else np.float32,
            return_knn_details=return_knn_details,
        ),
    )

    result = evaluator.evaluate(
        val_loader,
        eval_spatial_resolution=eval_spatial_resolution,
        return_knn_details=return_knn_details,
        ignore_index=effective_ignore,
    )
    logger.info("Phase stats: %s", evaluator.timer.summary())
    return result
