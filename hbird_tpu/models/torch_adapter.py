"""Live torch.nn.Module backbones as hbird_tpu feature extractors.

The reference accepts ANY torch model object — torch.hub, timm, HF —
either auto-detected (hbird/models.py:119-235, 326-354) or through the
user's `ftr_extr_fn` (README.md:147, eval.py:262-309). On a TPU host the
preferred path is weight conversion (models/convert.py) into the jittable
pure-JAX ViT; this adapter keeps the reference's *pluggability*: wrap the
torch module itself, run it eagerly on the host CPU per batch, and feed
its numpy tokens into the (non-jitted) evaluation steps.

Use when a backbone has no converter (exotic architectures) or to
cross-check a converted model against its torch original end-to-end.
The engine detects `jittable=False` and runs every step eagerly
(hbird_eval.py:366-368, 1076-1078) — correct, but the backbone no longer
fuses with retrieval, so throughput is host-bound. For production, convert.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import numpy as np

from hbird_tpu.models.extractor import FeatureExtractorSimple
from hbird_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def _extract_tokens(out) -> Any:
    """Locate the (B, N, D) token tensor in a torch model's output.

    Handles the reference's model-output shapes (eval.py:262-309):
    DINOv2-style dicts ('x_norm_patchtokens' — already patch-only),
    HF ModelOutput (.last_hidden_state), plain tensors, tuples/lists.
    Returns (tokens, patch_only).
    """
    if hasattr(out, "last_hidden_state"):  # HF ModelOutput dataclass
        return out.last_hidden_state, False
    if isinstance(out, dict):
        if "x_norm_patchtokens" in out:
            return out["x_norm_patchtokens"], True
        for key in ("x", "last_hidden_state", "tokens", "out", "features"):
            v = out.get(key)
            if v is not None and hasattr(v, "ndim"):
                return v, False
        for v in out.values():
            if hasattr(v, "ndim") and v.ndim == 3:
                return v, False
    if isinstance(out, (list, tuple)):
        for v in out:
            if hasattr(v, "ndim") and v.ndim == 3:
                return v, False
    if hasattr(out, "ndim"):
        return out, False
    raise TypeError(f"Could not locate a token tensor in {type(out)!r}")


def _minmax_np(x: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    """Min-max normalize the last dim (reference hbird/models.py:44-53)."""
    mins = x.min(axis=-1, keepdims=True)
    maxs = x.max(axis=-1, keepdims=True)
    return (x - mins) / np.maximum(maxs - mins, eps)


def _cls_attention(out, model, x, return_attn: bool) -> Optional[np.ndarray]:
    """Mean-head CLS->patch attention, min-max normalized (the reference's
    HF path, models.py:219-231). Sources, in order: HF ModelOutput
    `.attentions` (free when the forward already produced them), DINO
    hub's `get_last_selfattention` (a second forward — only when
    `return_attn` asked for it explicitly)."""
    att = None
    atts = getattr(out, "attentions", None)
    if atts:
        att = atts[-1]  # (B, heads, N, N), CLS at 0
    elif return_attn and hasattr(model, "get_last_selfattention"):
        att = model.get_last_selfattention(x)
    if att is None:
        return None
    # Token layout is [CLS, registers..., patches]; register-token ViTs
    # (DINOv2 -reg) must drop their registers or the map misaligns with
    # the patch grid.
    n_reg = int(
        getattr(model, "num_register_tokens", 0)
        or getattr(getattr(model, "config", None), "num_register_tokens", 0)
        or 0
    )
    cls_to_patches = att[:, :, 0, 1 + n_reg:].mean(dim=1)
    return _minmax_np(cls_to_patches.detach().float().cpu().numpy())


def make_torch_ftr_extr_fn(
    device: str = "cpu",
    use_amp: bool = False,
    forward: Optional[Callable] = None,
    return_attn: bool = False,
) -> Callable:
    """Build an `ftr_extr_fn(torch_model, imgs) -> (B, N, D) numpy`.

    imgs arrive as a concrete jax/numpy float array (B, 3, H, W), already
    normalized by the engine; tokens return as numpy f32 with the CLS
    token dropped via the reference's perfect-square heuristic
    (eval.py:303-309).

    Args:
        device: torch device for the module ('cpu' on TPU hosts).
        use_amp: torch.autocast around the forward (reference
            models.py:188-192; CUDA/CPU-bf16 only).
        forward: optional override `forward(model, torch_imgs) -> output`
            (e.g. `lambda m, x: m.get_intermediate_layers(x)[0]`).
        return_attn: also return mean-head CLS->patch attention (min-max
            normalized, reference models.py:219-231). HF models that
            accept `output_attentions` give it within the one forward;
            DINO-hub models pay a second forward via
            `get_last_selfattention`. Off by default — the engine never
            consumes attention (reference hbird_eval.py drops it too).
    """
    import torch

    def fn(model, imgs):
        # explicit copy: jax arrays view as read-only numpy, torch rejects
        x = torch.from_numpy(np.array(imgs, dtype=np.float32)).to(device)

        def run():
            if forward:
                return forward(model, x)
            if return_attn:
                # Recent transformers default to SDPA kernels, which
                # cannot capture attention probs (output_attentions comes
                # back None with a warning) — flip to eager once.
                impl = getattr(
                    getattr(model, "config", None), "_attn_implementation",
                    None,
                )
                if impl not in (None, "eager") and hasattr(
                    model, "set_attn_implementation"
                ):
                    try:
                        model.set_attn_implementation("eager")
                    except Exception:  # pragma: no cover - exotic models
                        pass
                # HF-style kwargs; non-HF modules reject them -> plain call
                try:
                    return model(x, output_attentions=True, return_dict=True)
                except TypeError:
                    pass
            return model(x)

        with torch.inference_mode():
            if use_amp and device != "cpu":
                with torch.autocast(device_type=device.split(":")[0]):
                    out = run()
            else:
                out = run()
            attn = _cls_attention(out, model, x, return_attn) if return_attn else None
        tokens, patch_only = _extract_tokens(out)
        tokens = tokens.detach().float().cpu().numpy()
        if tokens.ndim != 3:
            raise ValueError(f"Expected (B, N, D) tokens, got {tokens.shape}")
        n = tokens.shape[1]
        if not patch_only and n > 1 and math.isqrt(n - 1) ** 2 == n - 1:
            tokens = tokens[:, 1:, :]  # leading CLS token
        return tokens, attn

    return fn


def wrap_torch_backbone(
    module,
    eval_spatial_resolution: int,
    d_model: int,
    device: str = "cpu",
    use_amp: bool = False,
    forward: Optional[Callable] = None,
    return_attn: bool = False,
) -> FeatureExtractorSimple:
    """Wrap a live torch.nn.Module for the evaluation engine.

    Returns a FeatureExtractorSimple with `jittable=False`: the engine
    runs its steps eagerly and calls the torch module on host per batch —
    the reference's any-torch-model pluggability (README.md:147), intact.

    Example:
        model = torch.hub.load('facebookresearch/dino:main', 'dino_vits16')
        fe = wrap_torch_backbone(model, eval_spatial_resolution=14,
                                 d_model=384)
        miou = hbird_evaluation(fe, d_model=384, patch_size=16, ...)
    """
    module = module.eval().to(device)
    for p in module.parameters():
        p.requires_grad_(False)  # freeze (reference models.py:237-255)
    logger.info(
        "Wrapped torch backbone %s on %s (non-jittable eager path)",
        type(module).__name__, device,
    )
    return FeatureExtractorSimple(
        module,
        ftr_extr_fn=make_torch_ftr_extr_fn(
            device=device, use_amp=use_amp, forward=forward,
            return_attn=return_attn,
        ),
        eval_spatial_resolution=eval_spatial_resolution,
        d_model=d_model,
        jittable=False,
    )
