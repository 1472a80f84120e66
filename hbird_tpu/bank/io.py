"""Memory-bank persistence.

Replaces the reference's torch.save/torch.load memory persistence
(hbird/hbird_eval.py:371-400) with numpy formats, while still READING
torch-saved banks — the strict-parity injection hook: load a bank built by
the reference implementation to isolate retrieval/metric parity from
backbone/preprocessing drift (SURVEY §5 checkpoint/resume).

Formats by extension:
    .npy          numpy array
    .npz          numpy (key 'memory')
    .pt/.pth/.bin torch.load (read-only support)
    other         treated as .npy
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def memory_path_on_disk(path: str) -> Optional[str]:
    """The actual file a bank at `path` lives in, or None.

    save_memory appends '.npy' to extension-less paths, so existence
    checks must probe both spellings.
    """
    for p in (path, path + ".npy"):
        if os.path.isfile(p):
            return p
    return None


def save_memory(memory: np.ndarray, path: str) -> str:
    """Write the bank; returns the path actually written (save_memory
    appends '.npy' when `path` has no recognized extension)."""
    memory = np.asarray(memory)
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    if path.endswith(".npz"):
        np.savez(path, memory=memory)
    elif path.endswith((".pt", ".pth", ".bin")):
        import torch

        torch.save(torch.from_numpy(np.ascontiguousarray(memory)), path)
    else:
        path = path if path.endswith(".npy") else path + ".npy"
        np.save(path, memory)
    return path


def load_memory(path: str) -> np.ndarray:
    if path.endswith(".npz"):
        with np.load(path) as z:
            return np.asarray(z["memory"], np.float32)
    if path.endswith((".pt", ".pth", ".bin")):
        import torch

        t = torch.load(path, map_location="cpu", weights_only=False)
        return np.asarray(t.detach().cpu().numpy(), np.float32)
    p = memory_path_on_disk(path) or path
    return np.asarray(np.load(p), np.float32)
