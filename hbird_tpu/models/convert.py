"""Torch-checkpoint -> hbird_tpu ViT parameter converters.

The reference loads backbones via torch.hub / timm / HuggingFace and
`--checkpoint` state dicts (reference eval.py:198-239, models.py:326-354).
Here, pretrained torch weights are converted once into the functional
parameter layout of hbird_tpu.models.vit and used as plain JAX pytrees.

Supported families (one converter per torch naming convention):
- timm-style ViTs: DINO, DINOv2 (incl. -reg and giant/SwiGLU), MAE,
  MoCo-v3 (after prefix stripping), plain timm `vit_*`.
- HuggingFace `transformers` ViTModel (separate q/k/v projections).

All converters accept either a state-dict-like mapping of numpy arrays /
torch tensors, or a path to a torch checkpoint file.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional

import numpy as np

from hbird_tpu.models.vit import ViTConfig
from hbird_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def _to_numpy(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    try:  # torch tensor without importing torch at module scope
        return v.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(v)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint from disk into numpy arrays.

    Handles the common wrappers: {'state_dict': ...}, {'model': ...},
    {'teacher': ...} (DINO), and DDP 'module.' prefixes — mirroring the
    reference's unwrap-and-load-strict-False convenience (eval.py:230-233).
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "teacher"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
            break
    out = {}
    for k, v in sd.items():
        if not hasattr(v, "shape"):
            continue
        k = re.sub(r"^(module\.|backbone\.|base_encoder\.|momentum_encoder\.)", "", k)
        out[k] = _to_numpy(v)
    return out


def infer_config_from_timm_sd(
    sd: Mapping[str, np.ndarray], ln_eps: float = 1e-6
) -> ViTConfig:
    """Infer a ViTConfig from a timm-style state dict's shapes."""
    pw = sd["patch_embed.proj.weight"]  # (D, 3, p, p)
    d, _, p, _ = pw.shape
    depth = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"blocks\.(\d+)\.", k)) is not None
    )
    n_pos = sd["pos_embed"].shape[1]
    grid = int(round((n_pos - 1) ** 0.5))
    swiglu = any(".mlp.w12." in k or ".mlp.w1." in k for k in sd)
    layerscale = any(".ls1." in k or ".gamma_1" in k for k in sd)
    n_reg = sd["register_tokens"].shape[1] if "register_tokens" in sd else 0
    if swiglu:
        hidden = sd["blocks.0.mlp.w3.weight"].shape[1]
        mlp_ratio = hidden * 3 / 2 / d
    else:
        mlp_ratio = sd["blocks.0.mlp.fc1.weight"].shape[0] / d
    # Heads are not recoverable from shapes; use the standard 64-dim heads.
    # This is WRONG for families with non-64-dim heads (e.g. MoCo-v3 ViT-S:
    # 12 heads at width 384 = 32-dim heads) — attention outputs differ
    # silently. The CLI presets pass an explicit config; direct convert()
    # callers must too when their backbone deviates.
    num_heads = max(1, d // 64)
    if d % 64 != 0 or d <= 384:
        # d=384 is the known-ambiguous width: DINO ViT-S uses 6x64 heads,
        # MoCo-v3 ViT-S uses 12x32.
        import warnings

        warnings.warn(
            f"infer_config_from_timm_sd: assuming {num_heads} heads of dim "
            f"{d // num_heads} for width {d}. Head count cannot be inferred "
            "from weight shapes — pass an explicit ViTConfig(num_heads=...) "
            "if this backbone uses non-64-dim heads (e.g. MoCo-v3 ViT-S has "
            "12 heads at width 384).",
            stacklevel=2,
        )
    return ViTConfig(
        patch_size=p,
        width=d,
        depth=depth,
        num_heads=num_heads,
        mlp_ratio=float(mlp_ratio),
        img_size=grid * p,
        layerscale=layerscale,
        swiglu=swiglu,
        num_register_tokens=n_reg,
        ln_eps=ln_eps,
    )


def convert_timm_vit(
    sd: Mapping[str, Any] | str,
    config: Optional[ViTConfig] = None,
) -> tuple[Dict[str, Any], ViTConfig]:
    """Convert a timm-style ViT state dict (DINO/DINOv2/MAE/MoCo-v3/timm).

    Returns (params, config). Weight matrices are transposed to the
    (in, out) x@W layout; the conv patch embedding becomes a flattened
    (p*p*3, D) matmul kernel in (c, ph, pw) pixel order.
    """
    if isinstance(sd, str):
        sd = load_torch_state_dict(sd)
    sd = {k: _to_numpy(v) for k, v in sd.items()}
    if config is None:
        config = infer_config_from_timm_sd(sd)
    depth, d = config.depth, config.width

    pw = sd["patch_embed.proj.weight"].astype(np.float32)  # (D, 3, p, p)
    kernel = pw.reshape(d, -1).T  # (3*p*p, D) in (c, ph, pw) order

    def stack(fmt: str, transform=lambda x: x):
        return np.stack(
            [transform(sd[fmt.format(i)].astype(np.float32)) for i in range(depth)]
        )

    blocks: Dict[str, np.ndarray] = {
        "norm1_scale": stack("blocks.{}.norm1.weight"),
        "norm1_bias": stack("blocks.{}.norm1.bias"),
        "qkv_w": stack("blocks.{}.attn.qkv.weight", lambda x: x.T),
        "proj_w": stack("blocks.{}.attn.proj.weight", lambda x: x.T),
        "proj_b": stack("blocks.{}.attn.proj.bias"),
        "norm2_scale": stack("blocks.{}.norm2.weight"),
        "norm2_bias": stack("blocks.{}.norm2.bias"),
    }
    if "blocks.0.attn.qkv.bias" in sd:
        blocks["qkv_b"] = stack("blocks.{}.attn.qkv.bias")
    else:  # qkv_bias=False models
        blocks["qkv_b"] = np.zeros((depth, 3 * d), np.float32)

    if config.swiglu:
        if "blocks.0.mlp.w12.weight" in sd:  # SwiGLUFFNFused
            blocks["w12"] = stack("blocks.{}.mlp.w12.weight", lambda x: x.T)
            blocks["b12"] = stack("blocks.{}.mlp.w12.bias")
        else:  # separate w1/w2
            w1 = stack("blocks.{}.mlp.w1.weight", lambda x: x.T)
            w2 = stack("blocks.{}.mlp.w2.weight", lambda x: x.T)
            blocks["w12"] = np.concatenate([w1, w2], axis=-1)
            b1 = stack("blocks.{}.mlp.w1.bias")
            b2 = stack("blocks.{}.mlp.w2.bias")
            blocks["b12"] = np.concatenate([b1, b2], axis=-1)
        blocks["w3"] = stack("blocks.{}.mlp.w3.weight", lambda x: x.T)
        blocks["b3"] = stack("blocks.{}.mlp.w3.bias")
    else:
        blocks["fc1_w"] = stack("blocks.{}.mlp.fc1.weight", lambda x: x.T)
        blocks["fc1_b"] = stack("blocks.{}.mlp.fc1.bias")
        blocks["fc2_w"] = stack("blocks.{}.mlp.fc2.weight", lambda x: x.T)
        blocks["fc2_b"] = stack("blocks.{}.mlp.fc2.bias")

    if config.layerscale:
        if "blocks.0.ls1.gamma" in sd:
            blocks["ls1"] = stack("blocks.{}.ls1.gamma")
            blocks["ls2"] = stack("blocks.{}.ls2.gamma")
        else:  # older naming (gamma_1/gamma_2)
            blocks["ls1"] = stack("blocks.{}.gamma_1")
            blocks["ls2"] = stack("blocks.{}.gamma_2")

    params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": kernel,
            "bias": sd["patch_embed.proj.bias"].astype(np.float32),
        },
        "cls_token": sd["cls_token"].astype(np.float32),
        "pos_embed": sd["pos_embed"].astype(np.float32),
        "blocks": blocks,
        "norm": {
            "scale": sd["norm.weight"].astype(np.float32),
            "bias": sd["norm.bias"].astype(np.float32),
        },
    }
    if config.num_register_tokens:
        params["register_tokens"] = sd["register_tokens"].astype(np.float32)
    # DINOv2 stores pos_embed without registers; ours matches (registers are
    # appended after pos add, vit.py:_embed).
    logger.info(
        "Converted timm-style ViT: depth=%d width=%d patch=%d",
        depth,
        d,
        config.patch_size,
    )
    return jax_tree(params), config


def convert_hf_vit(
    sd: Mapping[str, Any] | str, config: Optional[ViTConfig] = None
) -> tuple[Dict[str, Any], ViTConfig]:
    """Convert a HuggingFace `transformers` ViTModel state dict.

    HF splits q/k/v into separate Linears and names LNs
    layernorm_before/after; LN eps defaults to 1e-12 in ViTConfig.
    """
    if isinstance(sd, str):
        sd = load_torch_state_dict(sd)
    sd = {re.sub(r"^vit\.", "", k): _to_numpy(v) for k, v in sd.items()}

    pw = sd["embeddings.patch_embeddings.projection.weight"].astype(np.float32)
    d, _, p, _ = pw.shape
    depth = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"encoder\.layer\.(\d+)\.", k)) is not None
    )
    n_pos = sd["embeddings.position_embeddings"].shape[1]
    grid = int(round((n_pos - 1) ** 0.5))
    if config is None:
        hidden = sd["encoder.layer.0.intermediate.dense.weight"].shape[0]
        config = ViTConfig(
            patch_size=p,
            width=d,
            depth=depth,
            num_heads=max(1, d // 64),
            mlp_ratio=hidden / d,
            img_size=grid * p,
            ln_eps=1e-12,
        )

    def g(i, name):
        return sd[f"encoder.layer.{i}.{name}"].astype(np.float32)

    qkv_w, qkv_b = [], []
    for i in range(depth):
        w = np.concatenate(
            [
                g(i, "attention.attention.query.weight").T,
                g(i, "attention.attention.key.weight").T,
                g(i, "attention.attention.value.weight").T,
            ],
            axis=1,
        )
        b = np.concatenate(
            [
                g(i, "attention.attention.query.bias"),
                g(i, "attention.attention.key.bias"),
                g(i, "attention.attention.value.bias"),
            ]
        )
        qkv_w.append(w)
        qkv_b.append(b)

    blocks = {
        "norm1_scale": np.stack([g(i, "layernorm_before.weight") for i in range(depth)]),
        "norm1_bias": np.stack([g(i, "layernorm_before.bias") for i in range(depth)]),
        "qkv_w": np.stack(qkv_w),
        "qkv_b": np.stack(qkv_b),
        "proj_w": np.stack(
            [g(i, "attention.output.dense.weight").T for i in range(depth)]
        ),
        "proj_b": np.stack([g(i, "attention.output.dense.bias") for i in range(depth)]),
        "norm2_scale": np.stack([g(i, "layernorm_after.weight") for i in range(depth)]),
        "norm2_bias": np.stack([g(i, "layernorm_after.bias") for i in range(depth)]),
        "fc1_w": np.stack([g(i, "intermediate.dense.weight").T for i in range(depth)]),
        "fc1_b": np.stack([g(i, "intermediate.dense.bias") for i in range(depth)]),
        "fc2_w": np.stack([g(i, "output.dense.weight").T for i in range(depth)]),
        "fc2_b": np.stack([g(i, "output.dense.bias") for i in range(depth)]),
    }
    params = {
        "patch_embed": {
            "kernel": pw.reshape(d, -1).T,
            "bias": sd["embeddings.patch_embeddings.projection.bias"].astype(
                np.float32
            ),
        },
        "cls_token": sd["embeddings.cls_token"].astype(np.float32),
        "pos_embed": sd["embeddings.position_embeddings"].astype(np.float32),
        "blocks": blocks,
        "norm": {
            "scale": sd["layernorm.weight"].astype(np.float32),
            "bias": sd["layernorm.bias"].astype(np.float32),
        },
    }
    return jax_tree(params), config


def convert_hf_dinov2(
    sd: Mapping[str, Any] | str, config: Optional[ViTConfig] = None
) -> tuple[Dict[str, Any], ViTConfig]:
    """Convert a HuggingFace Dinov2Model / Dinov2WithRegistersModel state dict.

    HF's Dinov2 (modeling_dinov2.py) mirrors the torch.hub DINOv2 blocks —
    pre-norm attention + LayerScale (`layer_scale1.lambda1`), MLP or SwiGLU
    (`mlp.fc1/fc2` or `mlp.weights_in/weights_out`), separate q/k/v Linears —
    so conversion reshapes into the same stacked-block layout as
    convert_timm_vit. Register tokens (`embeddings.register_tokens`) map to
    our post-pos-add insertion, which matches HF's ordering
    (modeling_dinov2_with_registers.py:164-166).
    """
    if isinstance(sd, str):
        sd = load_torch_state_dict(sd)
    sd = {
        re.sub(r"^(dinov2\.|dinov2_with_registers\.)", "", k): _to_numpy(v)
        for k, v in sd.items()
    }

    pw = sd["embeddings.patch_embeddings.projection.weight"].astype(np.float32)
    d, _, p, _ = pw.shape
    depth = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"encoder\.layer\.(\d+)\.", k)) is not None
    )
    n_pos = sd["embeddings.position_embeddings"].shape[1]
    grid = int(round((n_pos - 1) ** 0.5))
    swiglu = "encoder.layer.0.mlp.weights_in.weight" in sd
    n_reg = (
        sd["embeddings.register_tokens"].shape[1]
        if "embeddings.register_tokens" in sd
        else 0
    )
    if config is None:
        if swiglu:
            hidden = sd["encoder.layer.0.mlp.weights_out.weight"].shape[1]
            mlp_ratio = hidden * 3 / 2 / d
        else:
            hidden = sd["encoder.layer.0.mlp.fc1.weight"].shape[0]
            mlp_ratio = hidden / d
        config = ViTConfig(
            patch_size=p,
            width=d,
            depth=depth,
            num_heads=max(1, d // 64),
            mlp_ratio=float(mlp_ratio),
            img_size=grid * p,
            layerscale=True,
            swiglu=swiglu,
            num_register_tokens=n_reg,
            ln_eps=1e-6,
            # HF Dinov2Model interpolates size-based without antialias; the
            # -reg model uses antialias=True (modeling files, both verified).
            pos_interp_antialias=bool(n_reg),
        )

    def g(i, name):
        return sd[f"encoder.layer.{i}.{name}"].astype(np.float32)

    def stack(name, transform=lambda x: x):
        return np.stack([transform(g(i, name)) for i in range(depth)])

    qkv_w = np.stack(
        [
            np.concatenate(
                [
                    g(i, "attention.attention.query.weight").T,
                    g(i, "attention.attention.key.weight").T,
                    g(i, "attention.attention.value.weight").T,
                ],
                axis=1,
            )
            for i in range(depth)
        ]
    )
    if "encoder.layer.0.attention.attention.query.bias" in sd:
        qkv_b = np.stack(
            [
                np.concatenate(
                    [
                        g(i, "attention.attention.query.bias"),
                        g(i, "attention.attention.key.bias"),
                        g(i, "attention.attention.value.bias"),
                    ]
                )
                for i in range(depth)
            ]
        )
    else:
        qkv_b = np.zeros((depth, 3 * d), np.float32)

    blocks: Dict[str, np.ndarray] = {
        "norm1_scale": stack("norm1.weight"),
        "norm1_bias": stack("norm1.bias"),
        "qkv_w": qkv_w,
        "qkv_b": qkv_b,
        "proj_w": stack("attention.output.dense.weight", lambda x: x.T),
        "proj_b": stack("attention.output.dense.bias"),
        "norm2_scale": stack("norm2.weight"),
        "norm2_bias": stack("norm2.bias"),
        "ls1": stack("layer_scale1.lambda1"),
        "ls2": stack("layer_scale2.lambda1"),
    }
    if swiglu:
        blocks["w12"] = stack("mlp.weights_in.weight", lambda x: x.T)
        blocks["b12"] = stack("mlp.weights_in.bias")
        blocks["w3"] = stack("mlp.weights_out.weight", lambda x: x.T)
        blocks["b3"] = stack("mlp.weights_out.bias")
    else:
        blocks["fc1_w"] = stack("mlp.fc1.weight", lambda x: x.T)
        blocks["fc1_b"] = stack("mlp.fc1.bias")
        blocks["fc2_w"] = stack("mlp.fc2.weight", lambda x: x.T)
        blocks["fc2_b"] = stack("mlp.fc2.bias")

    params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": pw.reshape(d, -1).T,
            "bias": sd["embeddings.patch_embeddings.projection.bias"].astype(
                np.float32
            ),
        },
        "cls_token": sd["embeddings.cls_token"].astype(np.float32),
        "pos_embed": sd["embeddings.position_embeddings"].astype(np.float32),
        "blocks": blocks,
        "norm": {
            "scale": sd["layernorm.weight"].astype(np.float32),
            "bias": sd["layernorm.bias"].astype(np.float32),
        },
    }
    if n_reg:
        params["register_tokens"] = sd["embeddings.register_tokens"].astype(
            np.float32
        )
    logger.info(
        "Converted HF Dinov2: depth=%d width=%d patch=%d swiglu=%s reg=%d",
        depth, d, p, swiglu, n_reg,
    )
    return jax_tree(params), config


def jax_tree(params: Dict[str, Any]) -> Dict[str, Any]:
    """numpy pytree -> jnp pytree."""
    import jax.numpy as jnp

    return {
        k: jax_tree(v) if isinstance(v, dict) else jnp.asarray(v)
        for k, v in params.items()
    }


def convert(
    sd: Mapping[str, Any] | str,
    family: str = "auto",
    config: Optional[ViTConfig] = None,
):
    """Family dispatcher: 'timm'/'dino'/'dinov2'/'mae'/'mocov3' share the
    timm converter; 'hf' uses the HuggingFace converter. 'auto' sniffs keys."""
    if isinstance(sd, str):
        sd = load_torch_state_dict(sd)
    f = family.lower()
    if f == "auto":
        keys = set(sd.keys())
        if any("encoder.layer.0." in k for k in keys):
            # HF flavors: Dinov2 names block LNs norm1/norm2; ViTModel uses
            # layernorm_before/after.
            f = (
                "hf_dinov2"
                if any(
                    k.endswith("encoder.layer.0.norm1.weight") for k in keys
                )
                else "hf"
            )
        else:
            f = "timm"
    if f in ("timm", "dino", "dinov2", "mae", "mocov3", "moco"):
        return convert_timm_vit(sd, config)
    if f == "hf":
        return convert_hf_vit(sd, config)
    if f in ("hf_dinov2", "hf-dinov2"):
        return convert_hf_dinov2(sd, config)
    raise ValueError(f"Unknown model family: {family}")
