"""Leaf-sharded IVF search over a device mesh (tree + IndexShards).

The single-device tree backend (ops/ivf.py) partitions the bank into
fixed-capacity leaf slabs. Multi-chip, the slabs themselves shard over
the mesh's bank axis (shard s owns leaves [s*Ls, (s+1)*Ls)):

- queries are globally sorted by top-1 leaf (replicated centroids) for
  tile coherence, then replicated to every shard;
- each shard computes a per-tile shortlist of its LOCAL top-ceil(L/p)
  leaves and scans them with the IVF kernel — so the global probe
  budget L spreads across shards and every shard does identical-shape
  work (no ragged "how many of the global top-L live here" problem);
- the per-shard top-k merge + masked-psum label fetch is the same
  gather strategy as the flat sharded search
  (parallel/sharded_knn.sharded_knn_with_labels).

Total scanned rows stay ~L*cap; coverage is at least as wide as the
single-device shortlist whenever leaves distribute evenly (the forced
per-shard spread can only add leaves beyond the global top-L).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from hbird_tpu.ops.ivf import (
    coherent_query_order,
    ivf_search_xla,
    pallas_ivf_knn,
    select_block_leaves,
)
from hbird_tpu.ops.knn_pallas import _round_up


def shard_ivf_state(ivf_bank, ivf_labels, mesh: Mesh, bank_axis: str = "bank"):
    """Place the leaf-contiguous arrays row-sharded over the bank axis.
    (Slab boundaries align with shard boundaries because the tree
    geometry rounds n_leaves to a multiple of the axis size.)"""
    from jax.sharding import NamedSharding

    spec = NamedSharding(mesh, P(bank_axis))
    return jax.device_put(ivf_bank, spec), jax.device_put(ivf_labels, spec)


def sharded_ivf_knn_with_labels(
    queries: jax.Array,
    ivf_bank: jax.Array,
    ivf_labels: jax.Array,
    centroids: jax.Array,
    leaf_valid: jax.Array,
    k: int,
    *,
    mesh: Mesh,
    bank_axis: str = "bank",
    cap: int,
    n_probe: int,
    block_q: int = 256,
    sort_queries: bool = True,
    kernel: str = "auto",
    interpret: Optional[bool] = None,
    shard_probe: str = "split",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Tree search over a leaf-sharded mesh.

    Args:
        queries: (Q, D), replicated.
        ivf_bank / ivf_labels: (n_leaves*cap, D) / (n_leaves*cap, C),
            row-sharded over `bank_axis`.
        centroids: (n_leaves, D) f32, replicated (1.5 MB at 512x768 —
            each shard slices its local rows).
        leaf_valid: (n_leaves,) int32, replicated.
        k / cap / n_probe / block_q: tree-search geometry.
        shard_probe: how the probe budget maps onto shards —
            'split' (default): each shard probes its local
            top-ceil(n_probe/p) leaves, so total scanned rows stay
            ~n_probe*cap. When probe-worthy leaves concentrate on one
            shard (skewed query distributions) recall can differ from
            single-chip at the same n_probe, because another shard's
            forced picks replace globally-better leaves.
            'full': each shard probes its local top-min(n_probe,
            local_leaves) leaves — a superset of the single-chip
            shortlist, so recall >= single-chip at the same n_probe, at
            up to p× the scan cost.

    Returns:
        (values (Q, k) f32, indices (Q, k) int32 IVF-layout slot ids,
        neighbour labels (Q, k, C)) — replicated.
    """
    p = mesh.shape[bank_axis]
    n_slots, d = ivf_bank.shape
    n_leaves = n_slots // cap
    assert n_leaves % p == 0, (n_leaves, p)
    local_leaves = n_leaves // p
    local_slots = n_slots // p
    if shard_probe not in ("split", "full"):
        raise ValueError(f"shard_probe must be 'split' or 'full': {shard_probe}")
    per_shard = n_probe if shard_probe == "full" else -(-n_probe // p)
    l_p = min(max(1, per_shard), local_leaves)
    if kernel == "auto":
        kernel = "pallas" if jax.default_backend() == "tpu" else "xla"

    order = inv = None
    if sort_queries:
        order = coherent_query_order(queries, centroids)
        inv = jnp.argsort(order)
        queries = queries[order]
    q_n = queries.shape[0]
    q_pad = _round_up(q_n, block_q)
    if q_pad != q_n:
        # Edge padding: see ops/ivf.ivf_search — zero pad rows would
        # distort the last tile's leaf shortlist.
        queries = jnp.pad(queries, ((0, q_pad - q_n), (0, 0)), mode="edge")

    def local_search(q, bank_l, labels_l, cent, lv):
        i = jax.lax.axis_index(bank_axis)
        cent_l = jax.lax.dynamic_slice(
            cent, (i * local_leaves, 0), (local_leaves, d)
        )
        lv_l = jax.lax.dynamic_slice(lv, (i * local_leaves,), (local_leaves,))
        lids = select_block_leaves(q, cent_l, l_p, block_q)
        if kernel == "pallas":
            vals_l, idx_l = pallas_ivf_knn(
                q, bank_l, lids, lv_l, k, cap=cap, block_q=block_q,
                interpret=interpret,
            )
        else:
            vals_l, idx_l = ivf_search_xla(q, bank_l, lids, lv_l, k, cap=cap)
        start = (i * local_slots).astype(jnp.int32)
        gidx_l = idx_l + start

        # Gather the tiny per-shard candidate lists everywhere, merge.
        vals_g = jax.lax.all_gather(vals_l, bank_axis)  # (p, Q, k)
        gidx_g = jax.lax.all_gather(gidx_l, bank_axis)
        qq = vals_g.shape[1]
        cand_vals = vals_g.transpose(1, 0, 2).reshape(qq, p * k)
        cand_idx = gidx_g.transpose(1, 0, 2).reshape(qq, p * k)
        merged_vals, sel = jax.lax.top_k(cand_vals, k)
        merged_idx = jnp.take_along_axis(cand_idx, sel, axis=-1)

        # Label fetch via masked psum: only the owning shard contributes.
        mine = (merged_idx >= start) & (merged_idx < start + local_slots)
        rows = jnp.where(mine, merged_idx - start, 0)
        contrib = jnp.where(
            mine[..., None], jnp.take(labels_l, rows, axis=0), 0.0
        )
        merged_labels = jax.lax.psum(contrib, bank_axis)
        return merged_vals, merged_idx, merged_labels

    fn = jax.shard_map(
        local_search,
        mesh=mesh,
        in_specs=(P(None, None), P(bank_axis), P(bank_axis), P(None, None),
                  P(None)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    vals, idx, labels = fn(queries, ivf_bank, ivf_labels, centroids,
                           jnp.asarray(leaf_valid, jnp.int32))
    vals, idx, labels = vals[:q_n], idx[:q_n], labels[:q_n]
    if inv is not None:
        vals, idx, labels = vals[inv], idx[inv], labels[inv]
    return vals, idx, labels
