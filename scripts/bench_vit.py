"""ViT-B/14 @518 forward benchmark: f32/bf16 x xla/flash attention."""

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from hbird_tpu.models.vit import VIT_PRESETS, ViT

print("device:", jax.devices(), flush=True)

BATCH = 16
base_cfg = VIT_PRESETS["dinov2_vitb14"]
vit0 = ViT(base_cfg)
params = vit0.prepare_params(vit0.init(jax.random.PRNGKey(0)), 518)
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.normal(size=(BATCH, 3, 518, 518)), jnp.float32)

outs = {}
for dtype, attn in (
    (jnp.float32, "xla"),
    (jnp.bfloat16, "xla"),
    (jnp.bfloat16, "flash"),
):
    tag = f"{jnp.dtype(dtype).name}/{attn}"
    cfg = dataclasses.replace(base_cfg, compute_dtype=dtype, attention_impl=attn)
    vit = ViT(cfg)
    fwd = jax.jit(lambda p, x: vit.apply(p, x)["x_norm_patchtokens"])
    try:
        t0 = time.time()
        out = fwd(params, imgs)
        outs[tag] = np.asarray(out)
        print(f"[{tag}] first call: {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        for _ in range(5):
            out = fwd(params, imgs)
            float(np.asarray(out[:1, :1]).sum())
        dt = (time.time() - t0) / 5
        print(f"[{tag}] {dt*1e3:7.1f} ms -> {BATCH/dt:6.1f} img/s/chip", flush=True)
    except Exception as e:
        print(f"[{tag}] FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

ref = outs.get("float32/xla")
for tag, o in outs.items():
    if ref is None or tag == "float32/xla":
        continue
    rel = np.abs(o - ref).max() / (np.abs(ref).max() + 1e-9)
    cos = float(
        (o.reshape(-1) @ ref.reshape(-1))
        / (np.linalg.norm(o) * np.linalg.norm(ref))
    )
    print(f"[{tag}] vs f32/xla: max rel err {rel:.2e}, cos sim {cos:.6f}", flush=True)
