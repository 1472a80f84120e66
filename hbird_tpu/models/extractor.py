"""Feature-extractor wrappers: the pluggable backbone protocol.

Mirrors the reference's two wrappers (hbird/models.py:70-103, 119-235):

- `FeatureExtractorSimple`: wraps a user feature function
  `ftr_extr_fn(model, imgs) -> feats | (feats, attn)` — the path the
  reference CLI always takes (eval.py:311-330).
- `FeatureExtractor`: wraps an hbird_tpu ViT (params + config) and exposes
  `forward_features(imgs) -> (patch_tokens, normalized_cls_attention)`.

Both expose `eval_spatial_resolution` and `d_model`, the attributes the
evaluation engine reads (reference hbird_eval.py:133, 156-161). The
`forward_features` callable is pure w.r.t. image input and is jitted by
the engine, not here — so the engine can fuse backbone + retrieval +
label transfer into one XLA program.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from hbird_tpu.models.vit import ViT


def normalize_minmax(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Min-max normalize the last dim (reference hbird/models.py:44-53)."""
    mins = x.min(axis=-1, keepdims=True)
    maxs = x.max(axis=-1, keepdims=True)
    return (x - mins) / jnp.maximum(maxs - mins, eps)


def default_ftr_extr_fn(model, imgs):
    """Generic patch-token grabber (reference eval.py:262-309 semantics).

    `model` may be a callable (params are closed over) or a (fn, params)
    tuple; its output may be a (B, N, D) array, a dict (preferring
    'x_norm_patchtokens', then 'x'/'last_hidden_state'/'tokens'/'out'/
    'features'), or a tuple/list containing such an array. If token count
    N-1 is a perfect square, the first token is assumed CLS and dropped.
    """
    import math

    if isinstance(model, tuple) and callable(model[0]):
        out = model[0](model[1], imgs)
    elif callable(model):
        out = model(imgs)
    else:
        raise TypeError("model must be callable or a (fn, params) tuple")

    if isinstance(out, dict) and "x_norm_patchtokens" in out:
        tokens = out["x_norm_patchtokens"]
        if tokens.ndim != 3:
            raise ValueError(f"Expected (B, N, D), got {tokens.shape}")
        return tokens, None

    def grab(o):
        if hasattr(o, "ndim"):
            return o
        if isinstance(o, dict):
            for key in ("x", "last_hidden_state", "tokens", "out", "features"):
                v = o.get(key)
                if v is not None and hasattr(v, "ndim"):
                    return v
            for v in o.values():
                if hasattr(v, "ndim"):
                    return v
        if isinstance(o, (list, tuple)):
            for v in o:
                if hasattr(v, "ndim"):
                    return v
        raise TypeError("Could not locate token tensor in model output")

    tokens = grab(out)
    if tokens.ndim != 3:
        raise ValueError(f"Expected (B, N, D) token tensor, got {tokens.shape}")
    n = tokens.shape[1]
    if n > 1 and math.isqrt(n - 1) ** 2 == (n - 1):
        tokens = tokens[:, 1:, :]  # CLS present at index 0
    return tokens, None


class FeatureExtractorSimple:
    """Delegates feature extraction to a user-provided function.

    Args:
        model: arbitrary model object (e.g. a params pytree, or anything the
            user's function understands).
        ftr_extr_fn: callable (model, imgs) -> (B, N, D) features, or
            (features, attention) tuple. Must be jax-traceable for the fused
            engine path; set `jittable=False` to run it eagerly per batch.
        eval_spatial_resolution: S (patch grid side).
        d_model: embedding dim.
        jittable: whether the function can be traced under jax.jit.
    """

    def __init__(
        self,
        model: Any,
        ftr_extr_fn: Callable,
        eval_spatial_resolution: int = 14,
        d_model: int = 768,
        jittable: bool = True,
    ) -> None:
        self.model = model
        self.ftr_extr_fn = ftr_extr_fn
        self.eval_spatial_resolution = eval_spatial_resolution
        self.d_model = d_model
        self.jittable = jittable

    @property
    def pure_operand(self):
        """Pytree passed as a jit ARGUMENT to the engine's fused steps (so
        large weights are device buffers, not constants baked into the
        compiled program)."""
        return self.model

    def forward_features_pure(self, model, imgs):
        out = self.ftr_extr_fn(model, imgs)
        if isinstance(out, tuple):
            return out[0], (out[1] if len(out) > 1 else None)
        return out, None

    def forward_features(self, imgs) -> Tuple[jax.Array, Optional[jax.Array]]:
        return self.forward_features_pure(self.model, imgs)

    def __call__(self, imgs):
        return self.forward_features(imgs)

    def freeze_feature_extractor(self, unfreeze_layers=None, regex=False):
        """No-op for API parity: hbird_tpu backbones are parameter pytrees
        used purely functionally — nothing ever trains or unfreezes
        (reference hbird/models.py:237-255 exists for torch autograd)."""
        return None


class FeatureExtractor:
    """Extractor over an hbird_tpu ViT backbone.

    Args:
        vit: ViT module (architecture).
        params: parameter pytree (already pos-interpolated for the input
            size via `vit.prepare_params` — the engine does this).
        eval_spatial_resolution: S.
        d_model: embedding dim (defaults to the config width).
        use_bf16: run the backbone matmuls in bfloat16 (the TPU analogue of
            the reference's fp16 autocast, hbird/models.py:188-192).
    """

    def __init__(
        self,
        vit: ViT,
        params: Any,
        eval_spatial_resolution: Optional[int] = None,
        d_model: Optional[int] = None,
        use_bf16: bool = False,
    ) -> None:
        cfg = vit.config
        if use_bf16 and cfg.compute_dtype != jnp.bfloat16:
            import dataclasses

            cfg = dataclasses.replace(cfg, compute_dtype=jnp.bfloat16)
            vit = ViT(cfg)
        self.vit = vit
        self.params = params
        self.d_model = d_model or cfg.width
        self.eval_spatial_resolution = eval_spatial_resolution or cfg.grid_size
        self.jittable = True
        self.model = params  # uniform attribute with FeatureExtractorSimple

    @property
    def pure_operand(self):
        return self.params

    def forward_features_pure(self, params, imgs):
        out = self.vit.apply(params, imgs)
        return out["x_norm_patchtokens"], None

    def forward_features(self, imgs) -> Tuple[jax.Array, Optional[jax.Array]]:
        return self.forward_features_pure(self.params, imgs)

    def forward_features_with_attention(self, imgs):
        out = self.vit.apply(self.params, imgs, return_attention=True)
        n_prefix = 1 + self.vit.config.num_register_tokens
        attn = out["attn"][:, :, 0, n_prefix:].mean(axis=1)
        mins = attn.min(-1, keepdims=True)
        maxs = attn.max(-1, keepdims=True)
        attn = (attn - mins) / jnp.maximum(maxs - mins, 1e-12)
        return out["x_norm_patchtokens"], attn

    def get_intermediate_layer_feats(
        self, imgs, feat: str = "k", layer_num: int = -1
    ):
        """Q/K/V features of an intermediate layer + normalized CLS
        attention (reference hbird/models.py:257-321 equivalent)."""
        feats = self.vit.qkv_features(self.params, imgs, feat=feat, layer_num=layer_num)
        _, attn = self.forward_features_with_attention(imgs)
        return feats, attn

    def freeze_feature_extractor(self, unfreeze_layers=None, regex=False):
        """No-op for API parity (params are frozen by construction)."""
        return None

    def __call__(self, imgs):
        return self.forward_features(imgs)
