import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax, jax.numpy as jnp
t0=time.time()
print('platform:', jax.devices(), flush=True)

from hbird_tpu.ops import exact_knn, approx_knn
from hbird_tpu.core import cross_attention_from_scores, patchify_gt, patch_soft_labels
from hbird_tpu.utils.eval_metrics import PredsmIoU

rng = np.random.default_rng(0)
C, D, M = 7, 64, 5000
bank = rng.normal(size=(M, D)).astype(np.float32)
bank /= np.linalg.norm(bank, axis=1, keepdims=True)
bank_cls = rng.integers(0, C, size=M)
bank_labels = np.eye(C, dtype=np.float32)[bank_cls]
src = rng.integers(0, M, size=256)
q = bank[src] * 3.0 + 0.01 * rng.normal(size=(256, D)).astype(np.float32)
print('setup done', time.time()-t0, flush=True)

vals, idx = exact_knn(jnp.asarray(q), jnp.asarray(bank), k=30)
jax.block_until_ready((vals, idx))
print('exact_knn done', time.time()-t0, flush=True)
top1 = np.asarray(idx)[:, 0]
print('top-1 self-retrieval accuracy:', (top1 == src).mean(), flush=True)

labels = jnp.asarray(bank_labels)[idx]
qnorm = jnp.linalg.norm(jnp.asarray(q), axis=-1)
label_hat = cross_attention_from_scores(vals[None], qnorm[None], labels[None])[0]
pred = np.asarray(label_hat).argmax(-1)
gt = bank_cls[src]
print('label-transfer accuracy:', (pred == gt).mean(), flush=True)

metric = PredsmIoU(C, C)
metric.update(gt, pred)
miou, *_ = metric.compute(is_global_zero=True)
print('mIoU:', miou, flush=True)

_, aidx = approx_knn(jnp.asarray(q), jnp.asarray(bank), k=30, recall_target=0.95)
rec = np.mean([len(set(np.asarray(aidx)[i]) & set(np.asarray(idx)[i]))/30 for i in range(256)])
print('approx recall@30 vs exact:', round(float(rec), 4), flush=True)

gtmap = jnp.asarray(rng.integers(0, C, size=(2,1,32,32)), jnp.int32)
sl = patch_soft_labels(patchify_gt(gtmap, 8), C)
print('soft label row-sums ok:', bool(jnp.allclose(sl.sum(-1), 1.0)), flush=True)
print('TOTAL', time.time()-t0, flush=True)
