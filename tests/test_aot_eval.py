"""AOT-compiled eval step: parity with the jitted path + safe fallback.

The engine can pre-compile the fused eval step in a background thread
during the memory build (HbirdEvaluation(aot_eval=...), see
hbird_eval._start_aot_eval). These tests pin:
- the AOT executable is actually used when avals match, and produces the
  same mIoU as the jitted path on the same seeded fixture;
- a mis-specified AOT spec (wrong batch size) falls back to JIT silently.
"""

import random

import numpy as np
import pytest

from hbird_tpu import HbirdEvaluation
from hbird_tpu.data import get_dataset
from hbird_tpu.data.synthetic import make_voc_fixture
from hbird_tpu.data.transforms import (
    get_hbird_train_transforms,
    get_hbird_val_transforms,
)
from hbird_tpu.models import FeatureExtractorSimple

INPUT = 32
PATCH = 4
S = INPUT // PATCH


def oracle_fn(model, imgs):
    """Per-patch mean color — (B, S*S, 3)."""
    b, c, h, w = imgs.shape
    s = h // PATCH
    x = imgs.reshape(b, c, s, PATCH, s, PATCH).mean(axis=(3, 5))
    return x.transpose(0, 2, 3, 1).reshape(b, s * s, c), None


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("voc_aot") / "voc")
    make_voc_fixture(
        root,
        n_train=8,
        n_val=4,
        size=(48, 40),
        colorize=True,
        seed=5,
        class_pool=[1, 2, 3],
    )
    return root


def _run(voc_root, aot_eval, nn_method="exact", nn_params=None):
    random.seed(777)  # train augmentations draw from the global RNG
    tt = get_hbird_train_transforms(INPUT, device_normalize=True)
    vt = get_hbird_val_transforms(INPUT, device_normalize=True)
    ds, ign = get_dataset("voc", voc_root, 4, 0, tt, vt, None, None)
    fe = FeatureExtractorSimple(
        None, ftr_extr_fn=oracle_fn, eval_spatial_resolution=S, d_model=3
    )
    ev = HbirdEvaluation(
        fe,
        ds.train_dataloader(),
        num_classes=ds.get_num_classes(),
        n_neighbours=5,
        nn_method=nn_method,
        nn_params=nn_params,
        dataset_size=ds.get_train_dataset_size(),
        device_norm=tt.get("device_norm"),
        aot_eval=aot_eval,
    )
    miou = ev.evaluate(ds.val_dataloader(), S, ignore_index=ign)
    return float(miou), ev


def test_aot_matches_jit(voc_root):
    spec = dict(batch_size=4, input_size=INPUT, ignore_index=255)
    m_aot, ev_aot = _run(voc_root, spec)
    m_jit, ev_jit = _run(voc_root, None)
    assert getattr(ev_aot, "_aot_used", False), "AOT executable was not used"
    assert not getattr(ev_jit, "_aot_used", False)
    assert np.isclose(m_aot, m_jit, atol=1e-7), (m_aot, m_jit)


def test_aot_mismatched_spec_falls_back(voc_root):
    # Wrong batch size: the precompiled avals cannot match; the engine
    # must fall back to the jitted step and still score correctly.
    spec = dict(batch_size=5, input_size=INPUT, ignore_index=255)
    m_bad, ev = _run(voc_root, spec)
    assert not getattr(ev, "_aot_used", False)
    m_ref, _ = _run(voc_root, None)
    assert np.isclose(m_bad, m_ref, atol=1e-7), (m_bad, m_ref)


def test_aot_int8_rerank_backend(voc_root):
    # int8 + exact re-rank routes the quantization scale through the
    # state pytree — the config whose scale would otherwise be baked into
    # the AOT program as a (wrong) constant.
    spec = dict(batch_size=4, input_size=INPUT, ignore_index=255)
    params = dict(use_int8=True, num_reordering_candidates=8)
    m_aot, ev_aot = _run(voc_root, spec, nn_params=dict(params))
    m_jit, _ = _run(voc_root, None, nn_params=dict(params))
    assert getattr(ev_aot, "_aot_used", False), "AOT executable was not used"
    assert np.isclose(m_aot, m_jit, atol=1e-7), (m_aot, m_jit)


def test_aot_ivf_tree_backend(voc_root):
    # Tree-mode state specs derive from layout geometry, not the dummy's
    # arrays — the engine must still hit the AOT executable.
    spec = dict(batch_size=4, input_size=INPUT, ignore_index=255)
    params = dict(num_leaves=4, num_leaves_to_search=4, query_block=64)
    m_aot, ev = _run(voc_root, spec, nn_method="ivf", nn_params=dict(params))
    m_jit, _ = _run(voc_root, None, nn_method="ivf", nn_params=dict(params))
    assert getattr(ev, "_aot_used", False), "AOT executable was not used"
    assert np.isclose(m_aot, m_jit, atol=1e-7), (m_aot, m_jit)


def test_aot_after_treedir_restore(voc_root, tmp_path):
    # load_memory=True restores the index and must START the AOT
    # precompile against the restored bank's exact row count — the
    # restored-path evaluate hits the executable, not the JIT fallback.
    spec = dict(batch_size=4, input_size=INPUT, ignore_index=255)
    params = dict(num_leaves=4, num_leaves_to_search=4, query_block=64)
    path = str(tmp_path / "idx.treedir")

    random.seed(777)
    tt = get_hbird_train_transforms(INPUT, device_normalize=True)
    vt = get_hbird_val_transforms(INPUT, device_normalize=True)
    ds, ign = get_dataset("voc", voc_root, 4, 0, tt, vt, None, None)
    fe = FeatureExtractorSimple(
        None, ftr_extr_fn=oracle_fn, eval_spatial_resolution=S, d_model=3
    )

    def build(load):
        return HbirdEvaluation(
            fe, ds.train_dataloader(), num_classes=ds.get_num_classes(),
            n_neighbours=5, nn_method="ivf", nn_params=dict(params),
            dataset_size=ds.get_train_dataset_size(),
            device_norm=tt.get("device_norm"),
            f_mem_p=path, load_memory=load, aot_eval=dict(spec),
        )

    ev1 = build(load=False)
    m1 = float(ev1.evaluate(ds.val_dataloader(), S, ignore_index=ign))

    ev2 = build(load=True)
    assert ev2._aot is not None, "restore did not start the AOT precompile"
    m2 = float(ev2.evaluate(ds.val_dataloader(), S, ignore_index=ign))
    assert getattr(ev2, "_aot_used", False), "AOT executable was not used"
    assert np.isclose(m1, m2, atol=1e-7), (m1, m2)
