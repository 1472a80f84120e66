#!/usr/bin/env python3
"""Generate examples/hbird_eval_example_tpu.ipynb (the TPU counterpart of
the reference's Colab walkthroughs, reference examples/*.ipynb).

The notebook is built programmatically so its cells stay in sync with the
real API; run this script after API changes and re-execute the notebook.
"""

import nbformat as nbf

nb = nbf.v4.new_notebook()
nb.metadata["kernelspec"] = {
    "display_name": "Python 3",
    "language": "python",
    "name": "python3",
}

cells = []

cells.append(nbf.v4.new_markdown_cell("""\
# Hummingbird / Dense-NN-Retrieval evaluation on TPU

TPU-native walkthrough of `hbird-tpu` — the JAX/XLA/Pallas rebuild of
`vpariza/open-hummingbird-eval` (this notebook mirrors the reference's
`examples/hbird_eval_example_scann.ipynb`, swapping torch+ScaNN for a
fused on-device pipeline).

The evaluation scores the *semantic coherence of frozen ViT patch
features*: build a memory bank of patch embeddings + per-patch soft
labels over a training set, retrieve k=30 neighbours for every
validation patch, transfer labels with cross-attention, and score mIoU.

**What you need**
- `pip install -e .` from the repo root (JAX, numpy, pillow).
- A Pascal-VOC-layout dataset (folder or `.tar`) — see `DATASET.md` for
  the Tiny/Mini VOC downloads. This demo falls back to a generated
  synthetic fixture so it runs anywhere.
- Optional: a torch checkpoint for a real backbone (`torch` needed only
  for conversion)."""))

cells.append(nbf.v4.new_code_cell("""\
import os
import sys

# Running from a source checkout without `pip install -e .`? Add the
# repo root (this notebook lives in examples/).
try:
    import hbird_tpu
except ImportError:
    sys.path.insert(0, os.path.abspath(".."))

import jax

# On a TPU VM this shows TpuDevice(s); on CPU the demo still works.
# jax.config.update("jax_platforms", "cpu")  # uncomment to force CPU
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.devices()"""))

cells.append(nbf.v4.new_markdown_cell("""\
## 1. Data

Point `data_dir` at a VOC-layout dataset — a folder or a tar archive
(`archive.tar!/inner/path` works too, matching the reference's tar DSL).
Here we synthesize a tiny colorized fixture: images are deterministic
colorizations of their masks, so retrieval can actually recover the
segmentation without a pretrained backbone."""))

cells.append(nbf.v4.new_code_cell("""\
import tempfile

from hbird_tpu.data.synthetic import make_voc_fixture

data_dir = tempfile.mkdtemp() + "/voc"
make_voc_fixture(
    data_dir, n_train=24, n_val=8, size=(96, 80),
    colorize=True, seed=0, class_pool=[1, 2, 3, 4, 5],
)
data_dir"""))

cells.append(nbf.v4.new_markdown_cell("""\
## 2. Backbone

Three options, mirroring the reference's pluggable protocol:

1. **Presets + converted torch checkpoints** (the production path):
   `ViT(VIT_PRESETS["dinov2_vitb14"])` +
   `hbird_tpu.models.convert.convert_checkpoint(...)`.
2. **Any callable** via `ftr_extr_fn(model, imgs) -> (B, N, D)` — what
   we use below (a per-patch mean-color \"oracle\", so the demo needs no
   weights).
3. A prebuilt `FeatureExtractor` / `FeatureExtractorSimple` instance."""))

cells.append(nbf.v4.new_code_cell("""\
INPUT, PATCH = 32, 4


def mean_color_fn(model, imgs):
    b, c, h, w = imgs.shape
    s = h // PATCH
    x = imgs.reshape(b, c, s, PATCH, s, PATCH).mean(axis=(3, 5))
    return x.transpose(0, 2, 3, 1).reshape(b, s * s, c), None"""))

cells.append(nbf.v4.new_markdown_cell("""\
## 3. Run the evaluation

`hbird_evaluation` has signature parity with the reference
(`hbird/hbird_eval.py:640-722`): same flags, same defaults
(`nn_method="scann"` → the approximate backend; pass `"faiss"`/`"exact"`
for the exact Pallas kernel). TPU extras are keyword-only: `bf16_model`,
`bf16_bank`, `mesh`, `loader_mode`, `device_normalize`."""))

cells.append(nbf.v4.new_code_cell("""\
from hbird_tpu import hbird_evaluation

miou = hbird_evaluation(
    model=None,                  # the oracle needs no weights
    d_model=3,
    patch_size=PATCH,
    dataset_name="voc",
    data_dir=data_dir,
    batch_size=4,
    input_size=INPUT,
    augmentation_epoch=1,
    n_neighbours=5,
    nn_method="exact",
    ftr_extr_fn=mean_color_fn,
    num_workers=0,
)
print(f"mIoU = {float(miou):.4f}")"""))

cells.append(nbf.v4.new_markdown_cell("""\
### Interpreting the number

The metric averages IoU over all **21** VOC classes (reference
semantics), but this fixture only uses 5 of them + background — absent
classes score 0 — so the interesting quantity is mIoU relative to the
**perfect-label-transfer ceiling**: push the ground-truth soft labels
through the same patchify → bilinear-upsample → argmax path and score
that. Patch-grid boundary error is the only loss at the ceiling; the
retrieval pipeline should land close to it."""))

cells.append(nbf.v4.new_code_cell("""\
import numpy as np
import jax
import jax.numpy as jnp

from hbird_tpu.core import patch_soft_labels, patchify_gt
from hbird_tpu.data import get_dataset
from hbird_tpu.data.transforms import get_hbird_val_transforms
from hbird_tpu.utils.eval_metrics import PredsmIoU

va = get_hbird_val_transforms(INPUT)
ds, _ = get_dataset("voc", data_dir, 4, 0, va, va, None, None)
metric = PredsmIoU(21, 21, ignore_index=255)
for x, y in ds.val_dataloader():
    ids = jnp.asarray((np.asarray(y) * 255).round().astype(np.int32))
    lab = patch_soft_labels(patchify_gt(ids, PATCH), 21)
    lh = jnp.transpose(lab, (0, 3, 1, 2))
    up = jax.image.resize(
        lh, (lh.shape[0], 21, INPUT, INPUT), method="bilinear",
        antialias=False,
    )
    metric.update(np.asarray(ids)[:, 0], np.asarray(jnp.argmax(up, axis=1)))
ceiling = metric.compute(is_global_zero=True)[0]
print(f"mIoU = {float(miou):.4f} of ceiling {float(ceiling):.4f} "
      f"-> {float(miou)/float(ceiling):.0%} of perfect label transfer")"""))

cells.append(nbf.v4.new_markdown_cell("""\
## 4. The production configuration

With a real backbone and dataset the call looks like this (identical to
the reference walkthrough, plus the TPU extras). The engine streams
uint8 batches, normalizes on device, runs the fused
forward→kNN→label-transfer→confusion-matrix step under one `jit`, and
AOT-compiles the eval step in the background while the memory bank
builds.

```python
import torch
from hbird_tpu.models.vit import ViT, VIT_PRESETS
from hbird_tpu.models.convert import convert_checkpoint

cfg = VIT_PRESETS["dinov2_vitb14"]
params = convert_checkpoint(
    torch.load("dinov2_vitb14.pth", map_location="cpu"), cfg
)
miou = hbird_evaluation(
    model=(ViT(cfg), params),
    d_model=cfg.width,
    patch_size=cfg.patch_size,
    dataset_name="voc",             # voc | ade20k | cityscapes | coco-thing | coco-stuff
    data_dir="/data/VOCSegmentation.tar!/VOCSegmentation",
    batch_size=16,
    input_size=518,
    augmentation_epoch=2,
    nn_method="scann",              # default: approximate, recall ~1.0
    memory_size=10_240_000,
    bf16_model=True,                # 1.67x forward throughput
    bf16_bank=True,                 # half-HBM bank (faiss useFloat16)
)
```

For >1 chip, pass a mesh and the bank shards across it (Faiss
`IndexShards` equivalent; `shard_strategy="ring"` for the fully
unreplicated variant):

```python
from hbird_tpu.parallel import make_mesh
mesh = make_mesh((2, 4), ("data", "bank"))
miou = hbird_evaluation(..., mesh=mesh)
```"""))

cells.append(nbf.v4.new_markdown_cell("""\
## 5. CLI equivalent

```bash
python eval.py --dataset-name voc --data-dir /data/voc \\
    --model dinov2_vitb14 --checkpoint dinov2_vitb14.pth \\
    --input-size 518 --batch-size 16 --memory-size 10240000 \\
    --nn-method scann --nn-param use_int8=true --bf16 --out result.json
```

`--nn-param KEY=VALUE` accepts the reference's backend knobs
(`use_fp16`, `num_reordering_candidates`, ...) plus TPU extras
(`use_int8`, `kernel`, `shard_strategy`)."""))

nb.cells = cells

import os

out = os.path.join(os.path.dirname(__file__), "..", "examples",
                   "hbird_eval_example_tpu.ipynb")
with open(os.path.abspath(out), "w") as f:
    nbf.write(nb, f)
print("wrote", os.path.abspath(out))


# ---------------------------------------------------------------------
# Second notebook: multi-chip walkthrough (runs anywhere on a virtual
# CPU mesh; the same code drives real v5e-8 meshes).
# ---------------------------------------------------------------------
nb2 = nbf.v4.new_notebook()
nb2.metadata["kernelspec"] = nb.metadata["kernelspec"]
c2 = []

c2.append(nbf.v4.new_markdown_cell("""\
# Multi-chip Hummingbird evaluation

The multi-GPU counterpart of the reference's faiss-gpu walkthrough: the
memory bank shards over a device mesh (Faiss `IndexShards` ≙), batches
shard over a `data` axis, and the confusion matrix reduces across it.

This notebook runs on **8 virtual CPU devices** so it executes anywhere;
pointing the same code at a real TPU slice only changes the mesh's
device list."""))

c2.append(nbf.v4.new_code_cell("""\
import os
import sys

# BEFORE importing jax: 8 virtual CPU devices.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

try:
    import hbird_tpu
except ImportError:
    sys.path.insert(0, os.path.abspath(".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.devices()"""))

c2.append(nbf.v4.new_code_cell("""\
import tempfile

from hbird_tpu.data.synthetic import make_voc_fixture

data_dir = tempfile.mkdtemp() + "/voc"
make_voc_fixture(
    data_dir, n_train=16, n_val=8, size=(96, 80),
    colorize=True, seed=0, class_pool=[1, 2, 3, 4, 5],
)

INPUT, PATCH = 32, 4
S = INPUT // PATCH


def mean_color_fn(model, imgs):
    b, c, h, w = imgs.shape
    s = h // PATCH
    x = imgs.reshape(b, c, s, PATCH, s, PATCH).mean(axis=(3, 5))
    return x.transpose(0, 2, 3, 1).reshape(b, s * s, c), None"""))

c2.append(nbf.v4.new_markdown_cell("""\
## A (data=2, bank=4) mesh

Batches shard 2-way; memory-bank rows shard 4-way. Retrieval runs the
tiled kernel per shard, merges the per-shard top-k with an `all_gather`,
and fetches neighbour labels with a masked `psum` — only `(shards, Q, k)`
candidates and `(Q, k, C)` labels cross the interconnect."""))

c2.append(nbf.v4.new_code_cell("""\
from hbird_tpu import hbird_evaluation
from hbird_tpu.parallel import make_mesh

mesh = make_mesh((2, 4), ("data", "bank"))
miou = hbird_evaluation(
    model=None, d_model=3, patch_size=PATCH,
    dataset_name="voc", data_dir=data_dir,
    batch_size=4, input_size=INPUT,
    n_neighbours=5, nn_method="exact",
    ftr_extr_fn=mean_color_fn, num_workers=0,
    mesh=mesh,
)
print(f"sharded-bank mIoU = {float(miou):.4f}")"""))

c2.append(nbf.v4.new_markdown_cell("""\
## Ring strategy: nothing replicated

`shard_strategy=ring` shards the queries too: each device holds Q/n
queries + M/n bank rows, and query blocks rotate around the bank axis
via `ppermute` carrying their running top-k — the retrieval analogue of
ring attention. Use it when Q×D no longer fits replicated (full-VOC ~2M
queries)."""))

c2.append(nbf.v4.new_code_cell("""\
miou_ring = hbird_evaluation(
    model=None, d_model=3, patch_size=PATCH,
    dataset_name="voc", data_dir=data_dir,
    batch_size=4, input_size=INPUT,
    n_neighbours=5, nn_method="exact",
    nn_params={"shard_strategy": "ring"},
    ftr_extr_fn=mean_color_fn, num_workers=0,
    mesh=mesh,
)
print(f"ring mIoU = {float(miou_ring):.4f}  (== gather merge)")"""))

c2.append(nbf.v4.new_markdown_cell("""\
## Leaf-sharded IVF tree

`nn_method="ivf"` partitions the bank into k-means leaves; with a mesh,
the leaf slabs shard over the `bank` axis and each shard probes its
local top leaves (`parallel/sharded_ivf.py`). On v5e this is the
fastest backend at multi-million-row banks (3-4× the exact kernel at
recall ~0.99 — see README)."""))

c2.append(nbf.v4.new_code_cell("""\
miou_ivf = hbird_evaluation(
    model=None, d_model=3, patch_size=PATCH,
    dataset_name="voc", data_dir=data_dir,
    batch_size=4, input_size=INPUT,
    n_neighbours=5, nn_method="ivf",
    nn_params={"num_leaves": 8, "num_leaves_to_search": 8,
               "query_block": 64},
    ftr_extr_fn=mean_color_fn, num_workers=0,
    mesh=mesh,
)
print(f"ivf-tree mIoU = {float(miou_ivf):.4f}")"""))

nb2.cells = c2
out2 = os.path.join(os.path.dirname(__file__), "..", "examples",
                    "hbird_eval_multichip_tpu.ipynb")
with open(os.path.abspath(out2), "w") as f:
    nbf.write(nb2, f)
print("wrote", os.path.abspath(out2))
