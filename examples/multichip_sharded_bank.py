#!/usr/bin/env python3
"""Example: multi-chip evaluation with a mesh-sharded memory bank.

Demonstrates the scale-out surface (no reference analogue — the
reference's multi-GPU story is Faiss IndexShards, search_faiss.py:53-76):

- a ('data', 'bank') mesh: batches shard over 'data', bank rows over
  'bank';
- gather vs ring shard strategies for the kNN merge;
- sharded .bankdir persistence streamed straight onto the mesh.

Runs anywhere: with no TPU pod attached, set
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
to simulate 8 devices on CPU (this is exactly how the test suite and the
driver's multichip dryrun validate the sharding).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None,
                    help="torch ViT checkpoint (omit for a random-init demo)")
    ap.add_argument("--data-dir", default=None,
                    help="VOC root (omit to use a synthetic fixture)")
    ap.add_argument("--devices", type=int, default=None)
    ap.add_argument("--data-axis", type=int, default=2)
    ap.add_argument("--shard-strategy", choices=["gather", "ring"],
                    default="gather")
    ap.add_argument("--bank-dir", default=None,
                    help="optional .bankdir path to persist/reload the bank")
    ap.add_argument("--input-size", type=int, default=224)
    args = ap.parse_args()

    import jax

    from hbird_tpu import hbird_evaluation
    from hbird_tpu.parallel import make_mesh

    n = args.devices or jax.device_count()
    d_axis = args.data_axis if n % args.data_axis == 0 else 1
    mesh = make_mesh((d_axis, n // d_axis), ("data", "bank"))
    print(f"mesh: {dict(mesh.shape)} over {n} devices")

    data_dir = args.data_dir
    if data_dir is None:
        from hbird_tpu.data.synthetic import make_voc_fixture

        data_dir = "/tmp/hbird_multichip_demo/voc"
        if not os.path.isdir(data_dir):
            make_voc_fixture(data_dir, n_train=12, n_val=6, size=(96, 80),
                             colorize=True, class_pool=[1, 2, 3])

    if args.checkpoint:
        from hbird_tpu.models.convert import convert
        from hbird_tpu.models.vit import ViT

        params, cfg = convert(args.checkpoint, family="auto")
        model = (ViT(cfg), params)
        d_model, patch = cfg.width, cfg.patch_size
    else:
        from hbird_tpu.models.vit import VIT_PRESETS, ViT

        cfg = VIT_PRESETS["dino_vits16"]
        vit = ViT(cfg)
        params = vit.prepare_params(
            vit.init(jax.random.PRNGKey(0)), args.input_size
        )
        model = (vit, params)
        d_model, patch = cfg.width, cfg.patch_size

    miou = hbird_evaluation(
        model=model,
        d_model=d_model,
        patch_size=patch,
        dataset_name="voc",
        data_dir=data_dir,
        batch_size=2 * mesh.shape["data"],
        input_size=args.input_size,
        n_neighbours=5,
        nn_method="faiss",
        nn_params={"shard_strategy": args.shard_strategy},
        mesh=mesh,
        bf16_bank=True,
        f_mem_p=(os.path.join(args.bank_dir, "fmem.bankdir")
                 if args.bank_dir else None),
        l_mem_p=(os.path.join(args.bank_dir, "lmem.bankdir")
                 if args.bank_dir else None),
    )
    print(f"mIoU = {float(miou):.4f}  (strategy={args.shard_strategy})")


if __name__ == "__main__":
    main()
