"""Streaming class-matching mIoU (PredsmIoU).

API-compatible rebuild of the reference metric
(reference hbird/utils/eval_metrics.py:13-339): a streaming confusion
matrix with Hungarian (default) or greedy many-to-one pred->gt matching,
plus the `compute_miou` legacy adapter (including its deliberate gt/pred
swap, reference eval_metrics.py:316-321).

TPU-first design:
- The per-batch confusion matrix is computed ON DEVICE as a chunked
  one-hot matmul (MXU-friendly; counts stay < 2^24 per chunk so the f32
  accumulation is exact), then accumulated into a host int64 matrix.
  This replaces the reference's bincount-of(gt*P+pred) (eval_metrics.py:102-104),
  which would lower to a serial scatter on TPU.
- `confusion_matrix` is also exposed as a pure jittable function so the
  evaluation engine can fuse it into the eval step and `psum` it across a
  device mesh (making the reference's dormant torch.distributed.all_reduce
  hook, eval_metrics.py:250-252, real).
- The Hungarian assignment stays on host (scipy): the problem is at most
  ~151x151, no kernel needed.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from scipy.optimize import linear_sum_assignment as _scipy_lsa

    _SCIPY_AVAILABLE = True
except Exception:  # pragma: no cover
    _SCIPY_AVAILABLE = False

from hbird_tpu.utils.hungarian import hungarian as _np_hungarian

_CHUNK = 1 << 20  # pixels per on-device one-hot matmul chunk


def linear_sum_assignment(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Hungarian assignment: scipy > native C++ (utils/native.py) > numpy."""
    if _SCIPY_AVAILABLE:
        return _scipy_lsa(cost)
    try:
        from hbird_tpu.utils import native

        return native.hungarian(cost)
    except Exception:
        return _np_hungarian(cost)


@functools.partial(jax.jit, static_argnames=("num_gt", "num_pred", "ignore_index"))
def confusion_matrix(
    gt: jax.Array,
    pred: jax.Array,
    num_gt: int,
    num_pred: int,
    ignore_index: Optional[int] = None,
) -> jax.Array:
    """Confusion matrix (rows = GT classes, cols = predicted classes).

    Pure and jittable; safe to `jax.lax.psum` across a mesh axis. Invalid or
    ignored pixels contribute nothing (parity with reference masking,
    eval_metrics.py:86-95).

    Args:
        gt, pred: integer class-id arrays of identical shape.
        num_gt, num_pred: matrix dimensions G, P.
        ignore_index: optional GT label to drop.

    Returns:
        (G, P) int32 counts.
    """
    gt = gt.reshape(-1).astype(jnp.int32)
    pred = pred.reshape(-1).astype(jnp.int32)
    valid = (gt >= 0) & (gt < num_gt) & (pred >= 0) & (pred < num_pred)
    if ignore_index is not None:
        valid &= gt != ignore_index

    n = gt.shape[0]
    pad = (-n) % _CHUNK
    if pad:
        gt = jnp.pad(gt, (0, pad))
        pred = jnp.pad(pred, (0, pad))
        valid = jnp.pad(valid, (0, pad))

    n_chunks = gt.shape[0] // _CHUNK
    gt_c = gt.reshape(n_chunks, _CHUNK)
    pred_c = pred.reshape(n_chunks, _CHUNK)
    valid_c = valid.reshape(n_chunks, _CHUNK)

    def body(acc, chunk):
        g, p, v = chunk
        g_oh = jax.nn.one_hot(g, num_gt, dtype=jnp.float32) * v[:, None]
        p_oh = jax.nn.one_hot(p, num_pred, dtype=jnp.float32)
        partial = jnp.einsum(
            "ng,np->gp", g_oh, p_oh, preferred_element_type=jnp.float32
        )
        # Per-chunk counts are <= _CHUNK (exact in f32); the running total
        # is carried in int32 so a single huge update() call (e.g. the whole
        # concatenated VOC val set, ~389M pixels) never hits the f32 2^24
        # integer-precision cliff.
        return acc + partial.astype(jnp.int32), None

    init = jnp.zeros((num_gt, num_pred), jnp.int32)
    conf, _ = jax.lax.scan(body, init, (gt_c, pred_c, valid_c))
    return conf


class PredsmIoU:
    """Streaming mIoU with Hungarian / many-to-one class matching.

    Mirrors the reference constructor and `update`/`compute` signatures
    (reference hbird/utils/eval_metrics.py:25-288).
    """

    def __init__(
        self,
        num_pred_classes: int,
        num_gt_classes: int,
        device=None,  # accepted for API parity; placement is managed by JAX
        ignore_index: Optional[int] = None,
        prefer_cuda: bool = True,  # accepted for API parity; unused on TPU
        store_reordered_preds: bool = True,
    ) -> None:
        del device, prefer_cuda
        self.num_pred_classes = int(num_pred_classes)
        self.num_gt_classes = int(num_gt_classes)
        self.ignore_index = int(ignore_index) if ignore_index is not None else None
        self.store_reordered_preds = bool(store_reordered_preds)
        self._conf_mat = np.zeros(
            (self.num_gt_classes, self.num_pred_classes), dtype=np.int64
        )
        self._pred_chunks: List[np.ndarray] = []

    # ------------------------------------------------------------------
    def reset(self) -> None:
        self._conf_mat[:] = 0
        self._pred_chunks.clear()

    def update(self, gt, pred) -> None:
        """Stream a batch of (gt, pred) class-id arrays of identical shape."""
        gt = np.asarray(gt)
        pred = np.asarray(pred)
        if gt.shape != pred.shape:
            raise ValueError(f"Shapes must match. Got gt={gt.shape}, pred={pred.shape}")
        conf = confusion_matrix(
            jnp.asarray(gt.reshape(-1)),
            jnp.asarray(pred.reshape(-1)),
            self.num_gt_classes,
            self.num_pred_classes,
            self.ignore_index,
        )
        self._conf_mat += np.asarray(conf, dtype=np.int64)
        if self.store_reordered_preds:
            # Keep only pixels surviving the ignore/range masks, matching the
            # reference's retained-preds stream (eval_metrics.py:86-109).
            g = gt.reshape(-1)
            p = pred.reshape(-1)
            valid = (
                (g >= 0)
                & (g < self.num_gt_classes)
                & (p >= 0)
                & (p < self.num_pred_classes)
            )
            if self.ignore_index is not None:
                valid &= g != self.ignore_index
            self._pred_chunks.append(p[valid].astype(np.int32))

    def update_with_conf_mat(self, conf: np.ndarray, pred=None) -> None:
        """Accumulate a precomputed confusion matrix (e.g. from a jitted
        eval step or a mesh psum). `pred` (optional, already masked) feeds
        the reordered-preds stream."""
        self._conf_mat += np.asarray(conf, dtype=np.int64)
        if self.store_reordered_preds and pred is not None:
            # Store in the incoming dtype (uint8 from the fused eval step);
            # per-batch astype passes add up over a whole val set.
            self._pred_chunks.append(np.asarray(pred).reshape(-1))

    # ------------------------------------------------------------------
    def _score_matrix(self, precision_based: bool = False) -> np.ndarray:
        c = self._conf_mat.astype(np.float64)
        row_sum = c.sum(axis=1, keepdims=True)
        col_sum = c.sum(axis=0, keepdims=True)
        eps = 1e-8
        if not precision_based:
            denom = np.clip(row_sum + col_sum - c, eps, None)
        else:
            denom = np.clip(np.broadcast_to(col_sum, c.shape), eps, None)
        return c / denom

    def _many_to_one_mapping(self, precision_based: bool = False) -> np.ndarray:
        return self._score_matrix(precision_based).argmax(axis=0).astype(np.int64)

    def _hungarian_mapping(self) -> np.ndarray:
        iou = self._score_matrix(precision_based=False)
        row_ind, col_ind = linear_sum_assignment(1.0 - iou)
        mapping = np.zeros(self.num_pred_classes, dtype=np.int64)  # unmatched -> bg
        mapping[col_ind] = row_ind
        return mapping

    def _tp_fp_fn_from_mapping(
        self, mapping: Optional[np.ndarray]
    ) -> Tuple[List[int], List[int], List[int]]:
        c = self._conf_mat
        g, p = c.shape
        row_sum = c.sum(axis=1)
        if mapping is None:  # linear probe: identity columns
            col_sum = c.sum(axis=0)
            tp, fp, fn = [], [], []
            for i in range(g):
                tp_i = int(c[i, i]) if i < p else 0
                fp_i = int(col_sum[i] - c[i, i]) if i < p else 0
                fn_i = int(row_sum[i] - (c[i, i] if i < p else 0))
                tp.append(tp_i)
                fp.append(fp_i)
                fn.append(fn_i)
            return tp, fp, fn
        c_mapped = np.zeros((g, g), dtype=c.dtype)
        np.add.at(c_mapped, (slice(None), mapping), c)
        col_sum_mapped = c_mapped.sum(axis=0)
        tp_t = np.diag(c_mapped)
        fp_t = col_sum_mapped - tp_t
        fn_t = row_sum - tp_t
        return tp_t.tolist(), fp_t.tolist(), fn_t.tolist()

    @staticmethod
    def _miou_from_counts(tp, fp, fn) -> float:
        tp = np.asarray(tp, np.float64)
        fp = np.asarray(fp, np.float64)
        fn = np.asarray(fn, np.float64)
        iou = tp / np.clip(tp + fp + fn, 1e-8, None)
        return float(iou.mean())

    # ------------------------------------------------------------------
    def compute(
        self,
        is_global_zero: bool,
        many_to_one: bool = False,
        precision_based: bool = False,
        linear_probe: bool = False,
        sync_distributed: bool = False,
        return_reordered: bool = True,
    ):
        """Compute (miou, tp, fp, fn, reordered_preds, matched_bg_fraction).

        Defaults mirror the reference call site
        (hbird/hbird_eval.py:253 -> Hungarian matching).
        """
        local_conf = None
        if sync_distributed and jax.process_count() > 1:
            # COLLECTIVE: must run on every process (the reference's
            # dormant DDP hook, eval_metrics.py:250-252, all_reduces the
            # confusion matrix before rank gating for the same reason) —
            # so it sits BEFORE the is_global_zero early return. The
            # LOCAL matrix is restored afterwards (finally below): keeping
            # the global sum in self._conf_mat would make a second
            # compute() allgather already-summed matrices and inflate the
            # returned tp/fp/fn counts nproc-fold.
            from jax.experimental import multihost_utils

            # Gather int32 (x64 is disabled, so an int64 device array
            # would silently truncate anyway — per-process cell counts
            # fit int32 up to ~2.1B local pixels), sum in HOST int64 so
            # the global counts cannot overflow.
            gathered = np.asarray(
                multihost_utils.process_allgather(
                    jnp.asarray(self._conf_mat, jnp.int32)
                )
            )
            local_conf = self._conf_mat
            self._conf_mat = gathered.astype(np.int64).sum(axis=0)
        try:
            return self._compute_from_conf_mat(
                is_global_zero,
                many_to_one=many_to_one,
                precision_based=precision_based,
                linear_probe=linear_probe,
                return_reordered=return_reordered,
            )
        finally:
            if local_conf is not None:
                self._conf_mat = local_conf

    def _compute_from_conf_mat(
        self,
        is_global_zero: bool,
        *,
        many_to_one: bool,
        precision_based: bool,
        linear_probe: bool,
        return_reordered: bool,
    ):
        if not is_global_zero:
            return 0.0, [], [], [], [], 0.0

        if linear_probe:
            mapping = None
            matched_bg = 0.0
        elif many_to_one:
            mapping = self._many_to_one_mapping(precision_based)
            matched_bg = float((mapping == 0).sum() / max(self.num_pred_classes, 1))
        else:
            mapping = self._hungarian_mapping()
            matched_bg = 1.0 / max(self.num_gt_classes, 1)

        tp, fp, fn = self._tp_fp_fn_from_mapping(mapping)
        miou = self._miou_from_counts(tp, fp, fn)

        if return_reordered:
            if not self.store_reordered_preds:
                raise RuntimeError(
                    "return_reordered=True requires store_reordered_preds=True during updates."
                )
            if self._pred_chunks:
                pred_all = np.concatenate(self._pred_chunks)
            else:
                pred_all = np.zeros((0,), np.int64)
            if mapping is None:
                reordered = pred_all.astype(np.int64)
            else:
                reordered = mapping[pred_all]
            # Reference parity: callers who opt in get the LIST the
            # reference emits (its per-pixel `.tolist()` remaps,
            # eval_metrics.py:272-285) — list ops (`+`, `.index`,
            # truthiness) on the 5th return value must keep working. The
            # ~seconds-scale conversion is borne only by these callers;
            # the engine passes return_reordered=False.
            reordered_list = reordered.tolist()
        else:
            reordered_list = []

        return miou, tp, fp, fn, reordered_list, matched_bg

    # --- Backwards-compatible single-shot adapter -----------------------
    def compute_miou(
        self,
        gt: np.ndarray,
        pred: np.ndarray,
        num_pred: int,
        num_gt: int,
        many_to_one: bool = False,
        precision_based: bool = False,
        linear_probe: bool = False,
    ):
        """Single-shot numpy adapter. NOTE: the reference adapter assigns
        swapped-named temporaries and then swaps them back at the update
        call (eval_metrics.py:316-321) — the net effect is a plain
        update(gt, pred); golden-tested against the reference module."""
        self.__init__(
            num_pred_classes=num_pred,
            num_gt_classes=num_gt,
            ignore_index=self.ignore_index,
            store_reordered_preds=True,
        )
        self.update(np.asarray(gt), np.asarray(pred))
        miou, tp, fp, fn, reordered, bg = self.compute(
            is_global_zero=True,
            many_to_one=many_to_one,
            precision_based=precision_based,
            linear_probe=linear_probe,
            sync_distributed=False,
            return_reordered=True,
        )
        return (
            float(miou),
            [np.int64(x) for x in tp],
            [np.int64(x) for x in fp],
            [np.int64(x) for x in fn],
            [np.int64(x) for x in reordered],
            float(bg),
        )
