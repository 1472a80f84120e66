"""End-to-end engine verification on the default (TPU) platform:
synthetic colorized VOC fixture -> hbird_evaluation -> mIoU vs the
patch-level perfect-transfer ceiling."""

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

print("platform:", jax.devices(), flush=True)

from hbird_tpu import hbird_evaluation
from hbird_tpu.core import patch_soft_labels, patchify_gt
from hbird_tpu.data import get_dataset
from hbird_tpu.data.synthetic import make_voc_fixture
from hbird_tpu.data.transforms import get_hbird_val_transforms
from hbird_tpu.utils.eval_metrics import PredsmIoU

INPUT, PATCH = 32, 4
S = INPUT // PATCH


def oracle_fn(model, imgs):
    b, c, h, w = imgs.shape
    s = h // PATCH
    x = imgs.reshape(b, c, s, PATCH, s, PATCH).mean(axis=(3, 5))
    return x.transpose(0, 2, 3, 1).reshape(b, s * s, c), None


root = tempfile.mkdtemp() + "/voc"
make_voc_fixture(root, n_train=12, n_val=6, size=(64, 48), colorize=True,
                 seed=3, class_pool=[1, 2, 3, 4, 5])

t0 = time.time()
miou = hbird_evaluation(
    model=None,
    d_model=3,
    patch_size=PATCH,
    dataset_name="voc",
    data_dir=root,
    batch_size=4,
    input_size=INPUT,
    n_neighbours=5,
    nn_method="exact",
    ftr_extr_fn=oracle_fn,
    num_workers=2,
)
print(f"pipeline mIoU: {float(miou):.4f}  ({time.time()-t0:.1f}s)", flush=True)

# Ceiling: perfect transfer through the same upsample path.
va = get_hbird_val_transforms(INPUT)
ds, _ = get_dataset("voc", root, 4, 0, va, va, None, None)
m = PredsmIoU(21, 21, ignore_index=255)
for x, y in ds.val_dataloader():
    ids = jnp.asarray((np.asarray(y) * 255).round().astype(np.int32))
    lab = patch_soft_labels(patchify_gt(ids, PATCH), 21)
    up = jax.image.resize(
        jnp.transpose(lab, (0, 3, 1, 2)),
        (lab.shape[0], 21, INPUT, INPUT),
        method="bilinear",
        antialias=False,
    )
    m.update(np.asarray(ids)[:, 0], np.asarray(jnp.argmax(up, axis=1)))
ceiling = m.compute(is_global_zero=True)[0]
print(f"ceiling mIoU: {ceiling:.4f}  ratio: {float(miou)/ceiling:.2f}", flush=True)
assert float(miou) >= 0.5 * ceiling
print("ENGINE E2E OK", flush=True)
