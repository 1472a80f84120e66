#!/usr/bin/env python3
"""Repo-root CLI entry point: `python eval.py ...` (see hbird_tpu/eval_cli.py)."""

from hbird_tpu.eval_cli import main

if __name__ == "__main__":
    main()
