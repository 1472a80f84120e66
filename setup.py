#!/usr/bin/env python3
"""Shim for `pip install -e .` (configuration lives in pyproject.toml).

The native host library (native/hbird_native.cpp) is compiled on demand at
first use by hbird_tpu/utils/native.py; no build step is required here.
"""

from setuptools import setup

setup()
