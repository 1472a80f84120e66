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
    .bankdir      chunked directory format (streaming, >RAM banks)
    .treedir      a BUILT IVF index (slabs + centroids + layout) —
                  ScaNN searcher-serialization parity; reload skips
                  k-means/layout/scatter entirely
    other         treated as .npy
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def memory_path_on_disk(path: str) -> Optional[str]:
    """The actual file/dir a bank at `path` lives in, or None.

    save_memory appends '.npy' to extension-less paths, so existence
    checks must probe both spellings. Sharded banks are directories with
    a manifest.
    """
    if os.path.isdir(path) and os.path.isfile(os.path.join(path, SHARDED_MANIFEST)):
        return path
    for p in (path, path + ".npy"):
        if os.path.isfile(p):
            return p
    return None


def save_memory(memory: np.ndarray, path: str) -> str:
    """Write the bank; returns the path actually written (save_memory
    appends '.npy' when `path` has no recognized extension). Paths ending
    in '.bankdir' use the sharded chunked directory format."""
    if path.endswith(".bankdir"):
        return save_memory_sharded(memory, path)
    memory = np.asarray(memory)
    if memory.dtype.name == "bfloat16":
        # np.save writes extension dtypes as raw void bytes and flat
        # files carry no dtype manifest to view them back (the .bankdir
        # format does); widen to f32 — the reference's flat banks are
        # f32 anyway.
        memory = memory.astype(np.float32)
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
    if is_sharded_path(path):
        # Same cross-format contract as every other branch: f32 host
        # arrays (a bf16 .bankdir would otherwise surface ml_dtypes
        # arrays torch/older numpy consumers cannot handle). Callers
        # wanting the native dtype use load_memory_sharded directly.
        return np.asarray(load_memory_sharded(path), np.float32)
    if path.endswith(".npz"):
        with np.load(path) as z:
            return np.asarray(z["memory"], np.float32)
    if path.endswith((".pt", ".pth", ".bin")):
        import torch

        t = torch.load(path, map_location="cpu", weights_only=False)
        return np.asarray(t.detach().cpu().numpy(), np.float32)
    p = memory_path_on_disk(path) or path
    return np.asarray(np.load(p), np.float32)


# ---------------------------------------------------------------------------
# Sharded on-disk bank format (reference parity target: the torch.save
# whole-tensor persistence at hbird/hbird_eval.py:371-400 cannot scale to
# >host-RAM banks; SURVEY §7 step 4 calls for a chunked format).
#
# Layout:  <dir>/manifest.json   {"rows", "dim", "dtype", "chunks": [...]}
#          <dir>/chunk_00000.npy ...
#
# Save streams row blocks from any sliceable source (np array, np.memmap,
# jax.Array — slicing a jax array transfers only the slice) or a generator
# of blocks; load streams chunk-by-chunk, optionally placing rows directly
# onto a mesh's bank axis so no whole-bank host array ever exists.
# ---------------------------------------------------------------------------

import json

SHARDED_MANIFEST = "manifest.json"


def is_sharded_path(path: str) -> bool:
    return path.endswith(".bankdir") or os.path.isfile(
        os.path.join(path, SHARDED_MANIFEST)
    )


def save_memory_sharded(memory, dir_path: str, *, chunk_rows: int = 262144) -> str:
    """Write a bank as a directory of row chunks + manifest.

    `memory` is either (rows, dim) sliceable (numpy / memmap / jax.Array)
    or an iterator of (block_rows, dim) numpy blocks. Peak host memory is
    one chunk regardless of bank size.
    """
    os.makedirs(dir_path, exist_ok=True)
    chunks = []
    rows = 0
    dim = None
    dtype = None

    def blocks():
        if hasattr(memory, "shape") and hasattr(memory, "__getitem__"):
            n = memory.shape[0]
            for s in range(0, n, chunk_rows):
                yield np.asarray(memory[s : min(s + chunk_rows, n)])
        else:
            yield from (np.asarray(b) for b in memory)

    for i, blk in enumerate(blocks()):
        if dim is None:
            dim, dtype = int(blk.shape[1]), blk.dtype.name
        fname = f"chunk_{i:05d}.npy"
        np.save(os.path.join(dir_path, fname), blk)
        chunks.append({"file": fname, "rows": int(blk.shape[0])})
        rows += int(blk.shape[0])

    with open(os.path.join(dir_path, SHARDED_MANIFEST), "w") as f:
        json.dump(
            {"rows": rows, "dim": dim, "dtype": dtype, "chunks": chunks}, f
        )
    return dir_path


def iter_memory_chunks(dir_path: str):
    """Yield (start_row, block) pairs, chunk by chunk (mmap-backed).

    Extension dtypes (ml_dtypes bfloat16) survive np.save only as raw
    void bytes ('|V2'); the manifest records the true dtype, so chunks
    are bit-viewed back here — every reader goes through this."""
    with open(os.path.join(dir_path, SHARDED_MANIFEST)) as f:
        manifest = json.load(f)
    true_dtype = _manifest_dtype(manifest)
    start = 0
    for c in manifest["chunks"]:
        blk = np.load(os.path.join(dir_path, c["file"]), mmap_mode="r")
        if blk.dtype != true_dtype and blk.dtype.itemsize == true_dtype.itemsize:
            blk = blk.view(true_dtype)
        yield start, blk
        start += c["rows"]


def sharded_memory_info(dir_path: str) -> dict:
    with open(os.path.join(dir_path, SHARDED_MANIFEST)) as f:
        return json.load(f)


def _manifest_dtype(manifest: dict) -> np.dtype:
    try:
        return np.dtype(manifest["dtype"])
    except TypeError:
        import ml_dtypes  # registers bfloat16 et al. with numpy  # noqa: F401

        return np.dtype(manifest["dtype"])


def _read_rows(dir_path: str, manifest: dict, start: int, stop: int) -> np.ndarray:
    """Assemble rows [start, stop) touching only the overlapping chunks."""
    out = np.empty((stop - start, manifest["dim"]), _manifest_dtype(manifest))
    pos = 0
    for c_start, blk in iter_memory_chunks(dir_path):
        c_stop = c_start + blk.shape[0]
        lo, hi = max(start, c_start), min(stop, c_stop)
        if lo < hi:
            out[lo - start : hi - start] = blk[lo - c_start : hi - c_start]
            pos += hi - lo
        if c_start >= stop:
            break
    assert pos == stop - start, (pos, stop - start)
    return out


def load_memory_sharded(
    dir_path: str,
    *,
    mesh=None,
    bank_axis: str = "bank",
    dtype=None,
):
    """Load a sharded bank.

    Without a mesh: returns one host array (requires the bank to fit in
    host RAM). With a mesh: returns a jax.Array row-sharded over
    `bank_axis`, assembled per-device so peak host memory is ONE shard —
    the >RAM-bank path. Rows are zero-padded to an equal per-shard size;
    also returns valid_rows in that case.
    """
    manifest = sharded_memory_info(dir_path)
    rows, dim = manifest["rows"], manifest["dim"]
    if mesh is None:
        return _read_rows(dir_path, manifest, 0, rows)

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hbird_tpu.parallel.sharded_knn import pad_rows_for_mesh

    n_shards = mesh.shape[bank_axis]
    padded = pad_rows_for_mesh(rows, n_shards)
    sharding = NamedSharding(mesh, P(bank_axis))
    # Device order along the bank axis, as jax would lay out the array.
    dev_map = sharding.addressable_devices_indices_map((padded, dim))
    buffers = []
    for dev, idx in dev_map.items():
        s = idx[0].start or 0
        e = idx[0].stop if idx[0].stop is not None else padded
        blk = np.zeros((e - s, dim), _manifest_dtype(manifest))
        lo, hi = min(s, rows), min(e, rows)
        if hi > lo:
            blk[: hi - lo] = _read_rows(dir_path, manifest, lo, hi)
        if dtype is not None:
            blk = blk.astype(dtype)
        buffers.append(jax.device_put(blk, dev))
    arr = jax.make_array_from_single_device_arrays(
        (padded, dim), sharding, buffers
    )
    return arr, rows


# ---------------------------------------------------------------------------
# Built-tree persistence (.treedir) — serialize a CONSTRUCTED IVF index
# (leaf slabs + centroids + layout), the counterpart of ScaNN's searcher
# serialization (the reference's ScaNN backend rebuilds its tree every
# run from the flat bank, reference hbird/nn/search_scann.py:21-33; at
# 10M+ rows the k-means + balanced layout + scatter cost ~a minute that
# a load skips entirely).
#
# Layout:  <dir>/tree_meta.json    scalars (cap, valid_rows, dtype, ...)
#          <dir>/meta.npz          centroids/leaf_valid/perm/slots
#          <dir>/slabs.bankdir/    chunked (n_slots, D) leaf slabs
#          <dir>/labels.bankdir/   chunked (n_slots, C) f32 soft labels
#
# bfloat16 slabs are stored as uint16 bit patterns (np.save round-trips
# ml_dtypes.bfloat16 as raw void bytes and loses the dtype); the true
# dtype lives in tree_meta.json and the loader bitcasts back on device.
# ---------------------------------------------------------------------------

TREE_META = "tree_meta.json"


def is_tree_path(path: str) -> bool:
    return path.endswith(".treedir") or os.path.isfile(
        os.path.join(path, TREE_META)
    )


def tree_path_on_disk(path: str) -> Optional[str]:
    """The directory a saved tree at `path` lives in, or None."""
    if os.path.isdir(path) and os.path.isfile(os.path.join(path, TREE_META)):
        return path
    return None


def _storage_view(blk: np.ndarray):
    """bfloat16 -> uint16 bit view for npy storage (no copy)."""
    if blk.dtype.name == "bfloat16":
        return blk.view(np.uint16)
    return blk


def _host_replicated(x) -> np.ndarray:
    """Fetch a (possibly multi-host-sharded) array to host on EVERY
    process: non-fully-addressable jax arrays are resharded to fully
    replicated first (np.asarray on them raises otherwise)."""
    import jax

    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.sharding import NamedSharding, PartitionSpec

        x = jax.jit(
            lambda a: a,
            out_shardings=NamedSharding(x.sharding.mesh, PartitionSpec()),
        )(x)
    return np.asarray(x)


def _save_rows_distributed(arr, dir_path: str) -> None:
    """Multi-process .bankdir writer for a row-sharded global jax array
    on a shared filesystem: every process writes ONLY its addressable
    shards (replica 0 of each row slice), then process 0 derives the
    manifest from the array's global sharding — no shard ever crosses
    hosts. Produces the same manifest schema the single-process writer
    does, so every reader works unchanged."""
    import jax
    from jax.experimental import multihost_utils

    os.makedirs(dir_path, exist_ok=True)
    rows, dim = arr.shape
    for shard in arr.addressable_shards:
        if shard.replica_id != 0:
            continue  # row slices replicated across another mesh axis
        s = shard.index[0].start or 0
        np.save(
            os.path.join(dir_path, f"chunk_g{s:012d}.npy"),
            _storage_view(np.asarray(shard.data)),
        )
    multihost_utils.sync_global_devices("treedir_chunks:" + dir_path)
    if jax.process_index() == 0:
        slices = set()
        for idx in arr.sharding.devices_indices_map(arr.shape).values():
            s = idx[0].start or 0
            e = idx[0].stop if idx[0].stop is not None else rows
            slices.add((s, e))
        dtype = np.dtype(arr.dtype).name
        if dtype == "bfloat16":
            dtype = "uint16"
        with open(os.path.join(dir_path, SHARDED_MANIFEST), "w") as f:
            json.dump(
                {
                    "rows": rows,
                    "dim": dim,
                    "dtype": dtype,
                    "chunks": [
                        {"file": f"chunk_g{s:012d}.npy", "rows": e - s}
                        for s, e in sorted(slices)
                    ],
                },
                f,
            )
    multihost_utils.sync_global_devices("treedir_manifest:" + dir_path)


def save_tree_state(
    dir_path: str,
    *,
    ivf_bank,
    ivf_labels,
    centroids,
    leaf_valid,
    perm,
    slots,
    cap: int,
    valid_rows: int,
    bank_scale: Optional[float] = None,
    row_scale_in_labels: bool = False,
    col_scale=None,
    asym: bool = False,
    chunk_rows: int = 262144,
) -> str:
    """Write a built tree. `ivf_bank`/`ivf_labels` may be jax arrays
    (device-resident, possibly mesh-sharded) or numpy — rows are pulled
    chunk-by-chunk, so peak host memory is one chunk.

    Multi-process safe (shared filesystem): slab/label shards that span
    hosts are written by their OWNING process (each process only its
    addressable shards), the small meta arrays are resharded to
    replicated for the host fetch, and only process 0 writes manifests/
    meta; barriers order the phases."""
    import jax

    multiproc = jax.process_count() > 1 and isinstance(ivf_bank, jax.Array)
    primary = jax.process_index() == 0
    os.makedirs(dir_path, exist_ok=True)
    n_slots, dim = ivf_bank.shape
    bank_dtype = np.dtype(ivf_bank.dtype).name

    if multiproc:
        _save_rows_distributed(ivf_bank, os.path.join(dir_path, "slabs.bankdir"))
        _save_rows_distributed(
            ivf_labels, os.path.join(dir_path, "labels.bankdir")
        )
    else:
        def bank_blocks():
            for s in range(0, n_slots, chunk_rows):
                yield _storage_view(
                    np.asarray(ivf_bank[s : min(s + chunk_rows, n_slots)])
                )

        def label_blocks():
            for s in range(0, n_slots, chunk_rows):
                yield np.asarray(
                    ivf_labels[s : min(s + chunk_rows, n_slots)], np.float32
                )

        save_memory_sharded(
            bank_blocks(), os.path.join(dir_path, "slabs.bankdir")
        )
        save_memory_sharded(
            label_blocks(), os.path.join(dir_path, "labels.bankdir")
        )
    # The replication reshard inside _host_replicated is a COLLECTIVE —
    # every process must participate, even though only process 0 writes.
    cent_h = _host_replicated(centroids).astype(np.float32)
    lv_h = _host_replicated(leaf_valid).astype(np.int32)
    perm_h = _host_replicated(perm).astype(np.int32)
    slots_h = _host_replicated(slots).astype(np.int32)
    if primary:
        meta_arrays = dict(
            centroids=cent_h,
            leaf_valid=lv_h,
            perm=perm_h,
            slots=slots_h,
        )
        if col_scale is not None:
            # score_ah per-column-block dequant scales (d,) — small,
            # replicated, lives with the other meta arrays.
            meta_arrays["col_scale"] = np.asarray(col_scale, np.float32)
        np.savez(os.path.join(dir_path, "meta.npz"), **meta_arrays)
        meta = {
            "version": 1,
            "cap": int(cap),
            "valid_rows": int(valid_rows),
            "n_leaves": int(n_slots // cap),
            "dim": int(dim),
            # With row_scale_in_labels the LAST label column holds the
            # per-slot int8 dequant scales (SQ8); n_classes counts only
            # the real label columns.
            "n_classes": int(ivf_labels.shape[1]) - int(row_scale_in_labels),
            "bank_dtype": bank_dtype,
            "bank_scale": None if bank_scale is None else float(bank_scale),
            "row_scale_in_labels": bool(row_scale_in_labels),
            # Scoring mode, not just storage: int8_asym trees score bf16
            # queries against the codes; without this flag a reload
            # silently downgrades to symmetric int8_rows scoring.
            "asym": bool(asym),
        }
        with open(os.path.join(dir_path, TREE_META), "w") as f:
            json.dump(meta, f)
    if multiproc:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("treedir_meta:" + dir_path)
    return dir_path


def load_tree_state(dir_path: str, *, mesh=None, bank_axis: str = "bank"):
    """Load a saved tree as a dict ready for
    NearestNeighborSearchApprox.from_tree_state.

    Slabs are assembled ON DEVICE chunk-by-chunk with donated updates
    (peak device = full slab + one chunk; peak host = one chunk). With a
    mesh, slabs/labels land directly row-sharded over `bank_axis`
    (n_slots = n_leaves * cap is leaf-aligned, so P(bank_axis) row
    sharding keeps whole leaves on one shard whenever n_leaves divides
    by the axis size — the meshed tree's own layout invariant)."""
    import functools

    import jax
    import jax.numpy as jnp

    with open(os.path.join(dir_path, TREE_META)) as f:
        meta = json.load(f)
    z = np.load(os.path.join(dir_path, "meta.npz"))
    dtype = jnp.dtype(meta["bank_dtype"])
    stored_bf16 = meta["bank_dtype"] == "bfloat16"

    def assemble(sub, out_dtype):
        path = os.path.join(dir_path, sub)
        if mesh is not None:
            p = mesh.shape[bank_axis]
            # Every shard must hold WHOLE leaves: a leaf straddling a
            # shard boundary breaks the leaf-scan kernel's slab layout
            # (and load_memory_sharded would pad, shifting boundaries).
            # n_leaves % p == 0 is the meshed tree's own build invariant.
            if meta["n_leaves"] % p != 0:
                raise ValueError(
                    f"treedir has {meta['n_leaves']} leaves, not divisible "
                    f"by the mesh bank axis ({p}); leaves would straddle "
                    "shard boundaries"
                )
            arr, _rows = load_memory_sharded(path, mesh=mesh, bank_axis=bank_axis)
        else:
            info = sharded_memory_info(path)
            n, d = info["rows"], info["dim"]
            buf = jnp.zeros((n, d), jnp.dtype(info["dtype"]))

            @functools.partial(jax.jit, donate_argnums=(0,))
            def upd(b, blk, s):
                return jax.lax.dynamic_update_slice(b, blk, (s, 0))

            for start, blk in iter_memory_chunks(path):
                buf = upd(buf, jnp.asarray(np.asarray(blk)), start)
            arr = buf
        if sub.startswith("slabs") and stored_bf16:
            arr = jax.lax.bitcast_convert_type(arr, jnp.bfloat16)
        elif arr.dtype != out_dtype:
            arr = arr.astype(out_dtype)
        return arr

    ivf_bank = assemble("slabs.bankdir", dtype)
    ivf_labels = assemble("labels.bankdir", jnp.float32)
    bank_row_scale = None
    if meta.get("row_scale_in_labels", False):
        # The last label column carries the per-slot int8 dequant scales
        # (SQ8); split it back off. Column slicing preserves the row
        # sharding on meshed loads.
        bank_row_scale = ivf_labels[:, -1:]
        ivf_labels = ivf_labels[:, :-1]
    return dict(
        ivf_bank=ivf_bank,
        ivf_labels=ivf_labels,
        centroids=z["centroids"],
        leaf_valid=z["leaf_valid"],
        perm=z["perm"],
        slots=z["slots"],
        cap=meta["cap"],
        valid_rows=meta["valid_rows"],
        bank_scale=meta["bank_scale"],
        bank_row_scale=bank_row_scale,
        bank_col_scale=z["col_scale"] if "col_scale" in z.files else None,
        n_leaves=meta["n_leaves"],
        asym=meta.get("asym", False),
    )


def iter_bankdir_windows(
    feature_dir: str,
    label_dir: Optional[str] = None,
    *,
    window_rows: int = 524288,
):
    """Yield (features (n, D), labels (n, C) or None) in fixed global-row
    windows, reading only the overlapping chunks of each directory —
    feature and label .bankdirs may be chunked differently. Re-iterable
    (returns a fresh generator each call), as the streamed tree build
    requires."""
    f_info = sharded_memory_info(feature_dir)
    l_info = sharded_memory_info(label_dir) if label_dir else None
    if l_info is not None:
        assert l_info["rows"] == f_info["rows"], (l_info, f_info)
    rows = f_info["rows"]
    for s in range(0, rows, window_rows):
        e = min(s + window_rows, rows)
        feats = _read_rows(feature_dir, f_info, s, e)
        labs = (
            _read_rows(label_dir, l_info, s, e) if l_info is not None else None
        )
        yield feats, labs
