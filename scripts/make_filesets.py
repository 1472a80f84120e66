#!/usr/bin/env python3
"""Generate curated reduced-memory file sets (1/8, 1/64, 1/128 splits).

Reproduces the capability of the reference's shipped `file_sets/`
(reference file_sets/: voc & ade20k subsets at 1/8, 1/64, 1/128 with seeds
{42, 400, 783, 1293, 4019}): deterministic random subsets of a full
training list, written as one-id-per-line text files the --train-fs flag
consumes.

Usage:
    python scripts/make_filesets.py --full-list /data/voc/sets/trainaug.txt \
        --out-dir file_sets/voc --name trainaug
    python scripts/make_filesets.py --data-dir /data/voc --dataset voc \
        --out-dir file_sets/voc
"""

from __future__ import annotations

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbird_tpu.utils.io import read_file_set

DIVISORS = (8, 64, 128)
SEEDS = (42, 400, 783, 1293, 4019)


def discover_full_list(data_dir: str, dataset: str):
    from hbird_tpu.utils.io import list_files

    if dataset == "voc":
        p = (
            f"{data_dir}!/VOCSegmentation/sets/trainaug.txt"
            if data_dir.endswith(".tar")
            else os.path.join(data_dir, "sets", "trainaug.txt")
        )
        return read_file_set(p), "trainaug"
    if dataset == "ade20k":
        base = f"{data_dir}!/ade20k" if data_dir.endswith(".tar") else data_dir
        ids = [
            f[: -len(".jpg")]
            for f in list_files(os.path.join(base, "images", "training"))
            if f.endswith(".jpg")
        ]
        return sorted(ids), "training"
    raise ValueError(f"No default discovery for dataset {dataset!r}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--full-list", help="Path to the full id list (one per line).")
    ap.add_argument("--data-dir", help="Dataset root (alternative to --full-list).")
    ap.add_argument("--dataset", default="voc", choices=["voc", "ade20k"])
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--name", default=None, help="Base name for output files.")
    ap.add_argument("--divisors", type=int, nargs="+", default=list(DIVISORS))
    ap.add_argument("--seeds", type=int, nargs="+", default=list(SEEDS))
    args = ap.parse_args(argv)

    if args.full_list:
        ids = read_file_set(args.full_list)
        name = args.name or os.path.splitext(os.path.basename(args.full_list))[0]
    elif args.data_dir:
        ids, name = discover_full_list(args.data_dir, args.dataset)
        name = args.name or name
    else:
        ap.error("need --full-list or --data-dir")

    full_dir = os.path.join(args.out_dir, "full")
    os.makedirs(full_dir, exist_ok=True)
    with open(os.path.join(full_dir, f"{name}.txt"), "w") as f:
        f.write("\n".join(ids) + "\n")
    print(f"full: {len(ids)} ids")

    for div in args.divisors:
        n = len(ids) // div
        d = os.path.join(args.out_dir, f"1_div_{div}")
        os.makedirs(d, exist_ok=True)
        for seed in args.seeds:
            rng = random.Random(seed)
            subset = sorted(rng.sample(ids, n))
            out = os.path.join(d, f"{name}_{div}_{seed}.txt")
            with open(out, "w") as f:
                f.write("\n".join(subset) + "\n")
        print(f"1/{div}: {n} ids x {len(args.seeds)} seeds")


if __name__ == "__main__":
    main()
