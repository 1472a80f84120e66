"""End-to-end Hummingbird evaluation on TPU at realistic shapes.

Synthetic colorized VOC fixture + random-weight ViT backbone; validates the
full fused pipeline (host feed -> bf16 ViT forward -> pallas kNN ->
cross-attention -> upsample -> conf-mat) on-chip and reports phase stats.
"""

import argparse
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hbird_tpu import HbirdEvaluation
from hbird_tpu.data import get_dataset
from hbird_tpu.data.synthetic import make_voc_fixture
from hbird_tpu.data.transforms import (
    get_hbird_train_transforms,
    get_hbird_val_transforms,
)
from hbird_tpu.models import FeatureExtractor
from hbird_tpu.models.vit import VIT_PRESETS, ViT


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="dino_vits16")
    ap.add_argument("--input-size", type=int, default=224)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--n-train", type=int, default=128)
    ap.add_argument("--n-val", type=int, default=64)
    ap.add_argument("--memory-size", type=int, default=None)
    ap.add_argument("--kernel", default="auto")
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--host-normalize", action="store_true",
                    help="f32 host feed (legacy) instead of uint8 + "
                         "on-device normalize")
    ap.add_argument("--no-aot", action="store_true",
                    help="disable the background AOT compile of the eval "
                         "step (measures the inline-JIT baseline)")
    ap.add_argument("--nn-method", default="exact",
                    choices=["exact", "scann", "ivf"])
    ap.add_argument("--n-probe", type=int, default=32)
    args = ap.parse_args()

    print("device:", jax.devices(), flush=True)
    t0 = time.time()
    root = tempfile.mkdtemp() + "/voc"
    make_voc_fixture(
        root,
        n_train=args.n_train,
        n_val=args.n_val,
        size=(320, 240),
        colorize=True,
        seed=0,
        class_pool=list(range(1, 11)),
    )
    print(f"fixture built ({time.time()-t0:.1f}s)", flush=True)

    cfg = VIT_PRESETS[args.preset]
    vit = ViT(cfg)
    params = vit.prepare_params(vit.init(jax.random.PRNGKey(0)), args.input_size)
    s = args.input_size // cfg.patch_size
    fe = FeatureExtractor(
        vit, params, eval_spatial_resolution=s, d_model=cfg.width, use_bf16=args.bf16
    )

    dev_norm = not args.host_normalize
    tr = get_hbird_train_transforms(args.input_size, device_normalize=dev_norm)
    va = get_hbird_val_transforms(args.input_size, device_normalize=dev_norm)
    ds, ign = get_dataset("voc", root, args.batch_size, 8, tr, va, None, None)

    t0 = time.time()
    nn_params = (
        {"num_leaves_to_search": args.n_probe}
        if args.nn_method == "ivf"
        else {"kernel": args.kernel}
    )
    ev = HbirdEvaluation(
        fe,
        ds.train_dataloader(),
        num_classes=21,
        n_neighbours=30,
        nn_method=args.nn_method,
        nn_params=nn_params,
        memory_size=args.memory_size,
        dataset_size=ds.get_train_dataset_size(),
        bf16_bank=True,
        device_norm=tr.get("device_norm"),
        aot_eval=None if args.no_aot else dict(
            batch_size=args.batch_size,
            input_size=args.input_size,
            ignore_index=ign,
            img_dtype="uint8" if dev_norm else "float32",
            mask_dtype="uint8" if dev_norm else "float32",
        ),
    )
    print(f"memory+index: {time.time()-t0:.1f}s "
          f"({ev.feature_memory.shape[0]} rows)", flush=True)
    t0 = time.time()
    miou = ev.evaluate(ds.val_dataloader(), s, ignore_index=ign)
    print(f"evaluate: {time.time()-t0:.1f}s  mIoU={float(miou):.4f}", flush=True)
    print("phase stats:", ev.timer.summary(), flush=True)


if __name__ == "__main__":
    main()
