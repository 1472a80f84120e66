"""TRUE end-to-end golden parity against the reference ENGINE.

Round-1 golden tests covered the metric module and the engine's
sub-functions; this module runs the reference's own `HbirdEvaluation`
(/root/reference/hbird/hbird_eval.py:54-637) end-to-end next to ours on
an identical deterministic fixture:

- same images/masks (pre-transformed tensors fed through list loaders, so
  no torchvision is exercised),
- same linear-projection "backbone" (torch module vs jax function, same
  weights),
- reference `_create_nn` monkeypatched with a 15-line torch exact-top-k
  backend (faiss/scann are not installed) — semantically identical to
  GpuIndexFlatIP,
- run A: the reference builds the memory, saves it with torch.save, and
  our engine INJECTS it via the .pt load hook -> mIoU must match to 1e-6
  and per-query neighbor sets must be identical;
- run B: each engine builds its own (unbounded, deterministic) memory ->
  mIoU must still match tightly (only fp summation order differs).
"""

import enum
import importlib
import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "hbird")),
    reason="reference checkout not mounted",
)

# Fixture geometry: 32x32 images, 8px patches -> 4x4 grid of 16 patches.
INPUT, PATCH, C, DM, K = 32, 8, 6, 24, 5
S = INPUT // PATCH
N_TRAIN, N_VAL, BATCH = 8, 6, 2


@pytest.fixture(scope="module")
def ref_engine():
    """Import the reference hbird.hbird_eval with stubs for heavy deps."""
    saved = {
        k: sys.modules.pop(k)
        for k in list(sys.modules)
        if k == "hbird" or k.startswith("hbird.")
    }

    stubbed = []

    def stub(name, attrs=()):
        m = types.ModuleType(name)
        # a None __spec__ breaks importlib.util.find_spec for any later
        # caller (e.g. transformers' availability probes)
        import importlib.machinery

        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        for a in attrs:
            setattr(m, a, type(a, (), {"__init__": lambda self, *x, **k: None}))
        if name not in sys.modules:
            sys.modules[name] = m
            stubbed.append(name)
        return sys.modules[name]

    tv = stub("torchvision")
    trn = stub(
        "torchvision.transforms",
        ("Resize", "Compose", "ToTensor", "Normalize", "ColorJitter",
         "RandomApply", "RandomResizedCrop"),
    )
    tv.transforms = trn
    tvf = stub("torchvision.transforms.functional")
    trn.functional = tvf

    class IM(enum.Enum):
        BILINEAR = 2
        NEAREST = 0

    trn.InterpolationMode = IM
    tv.datasets = stub("torchvision.datasets", ("VisionDataset",))
    stub("pytorch_lightning", ("LightningDataModule",))
    stub("scann")
    stub("faiss")

    sys.path.insert(0, REF_ROOT)
    try:
        mod = importlib.import_module("hbird.hbird_eval")
    finally:
        sys.path.remove(REF_ROOT)
        for k in list(sys.modules):
            if k == "hbird" or k.startswith("hbird."):
                del sys.modules[k]
        for k in stubbed:
            sys.modules.pop(k, None)
        sys.modules.update(saved)
    return mod


class _TorchExactNN:
    """Drop-in for the faiss backend: exact dot-product top-k in torch
    (semantics of GpuIndexFlatIP, reference search_faiss.py:34-48)."""

    def __init__(self, memory, n_neighbors=30, **_):
        self.memory = torch.as_tensor(np.asarray(memory), dtype=torch.float32)
        self.k = n_neighbors

    def find_nearest_neighbors(self, q):
        q = torch.as_tensor(np.asarray(q), dtype=torch.float32)
        scores = q @ self.memory.T
        vals, idx = torch.topk(scores, self.k, dim=-1)
        return idx.numpy(), vals.numpy()


def _fixture_data():
    """Deterministic (images, masks) batches shared by both engines.

    Masks are floats in [0,1] exactly as the reference dataloaders deliver
    them (ToTensor semantics): ids/255. Class ids 0..C-1 plus 255 (ignore)
    round-trip exactly through both (y*255).long() and rint(y*255).
    """
    rng = np.random.default_rng(42)

    # Fixed per-class color signatures: images carry class signal, so the
    # pipeline operates in a realistic (high-mIoU) regime rather than pure
    # noise — near-ties in retrieval are still exercised by the noise term.
    palette = np.random.default_rng(9).normal(size=(C, 3)).astype(np.float32)

    def batch_stream(n_imgs, seed_shift):
        batches = []
        r = np.random.default_rng(1000 + seed_shift)
        for i in range(0, n_imgs, BATCH):
            ids = r.integers(0, C, size=(BATCH, 1, INPUT, INPUT))
            color = palette[ids[:, 0]].transpose(0, 3, 1, 2)  # (B,3,H,W)
            noise = r.normal(size=(BATCH, 3, INPUT, INPUT)).astype(np.float32)
            imgs = (2.0 * color + 0.5 * noise).astype(np.float32)
            # sprinkle ignore pixels (mask only; image color untouched)
            ign = r.random(size=ids.shape) < 0.05
            ids = np.where(ign, 255, ids)
            masks = (ids / 255.0).astype(np.float32)
            batches.append((imgs, masks))
        return batches

    del rng
    return batch_stream(N_TRAIN, 0), batch_stream(N_VAL, 7)


def _proj_weights():
    r = np.random.default_rng(5)
    return r.normal(size=(3 * PATCH * PATCH, DM)).astype(np.float32)


def _patch_pixels_np(x):
    """(B,3,H,W) -> (B, S*S, 3*P*P), channel-major pixel order."""
    b = x.shape[0]
    xx = x.reshape(b, 3, S, PATCH, S, PATCH)
    xx = xx.transpose(0, 2, 4, 1, 3, 5)  # (B,S,S,3,P,P)
    return xx.reshape(b, S * S, 3 * PATCH * PATCH)


class _TorchBackbone(torch.nn.Module):
    def __init__(self, w):
        super().__init__()
        self.register_buffer("w", torch.from_numpy(w))
        self.eval_spatial_resolution = S
        self.d_model = DM

    def forward_features(self, x):
        xx = x.reshape(-1, 3, S, PATCH, S, PATCH)
        xx = xx.permute(0, 2, 4, 1, 3, 5).reshape(x.shape[0], S * S, -1)
        return xx @ self.w, None


def _jax_extractor(w):
    from hbird_tpu.models import FeatureExtractorSimple

    w_j = jnp.asarray(w)

    def fn(model, imgs):
        b = imgs.shape[0]
        xx = imgs.reshape(b, 3, S, PATCH, S, PATCH)
        xx = xx.transpose(0, 2, 4, 1, 3, 5).reshape(b, S * S, -1)
        return xx @ model, None

    return FeatureExtractorSimple(
        w_j, fn, eval_spatial_resolution=S, d_model=DM
    )


def _run_reference(ref_engine, train, val, w, tmp, monkeypatch):
    monkeypatch.setattr(
        ref_engine.HbirdEvaluation,
        "_create_nn",
        lambda self, n_neighbours=30, nn_method="faiss", **kw: setattr(
            self, "NN_algorithm", _TorchExactNN(self.feature_memory, n_neighbours)
        ),
    )
    t_train = [(torch.from_numpy(x), torch.from_numpy(y)) for x, y in train]
    t_val = [(torch.from_numpy(x), torch.from_numpy(y)) for x, y in val]
    ev = ref_engine.HbirdEvaluation(
        _TorchBackbone(w),
        t_train,
        num_classes=C,
        n_neighbours=K,
        augmentation_epoch=1,
        device="cpu",
        nn_method="faiss",
        f_mem_p=str(tmp / "ref_fmem.pt"),
        l_mem_p=str(tmp / "ref_lmem.pt"),
    )
    jac = ev.evaluate(t_val, S, ignore_index=255)
    return ev, float(jac)


@pytest.fixture(scope="module")
def fixture_env(ref_engine, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e_golden")
    train, val = _fixture_data()
    w = _proj_weights()
    # monkeypatch fixture is function-scoped; patch manually for the module.
    orig = ref_engine.HbirdEvaluation._create_nn

    class MP:
        def setattr(self, obj, name, value):
            setattr(obj, name, value)

    ref_ev, ref_miou = _run_reference(ref_engine, train, val, w, tmp, MP())
    ref_engine.HbirdEvaluation._create_nn = orig
    return dict(
        tmp=tmp, train=train, val=val, w=w, ref_ev=ref_ev, ref_miou=ref_miou
    )


class TestInjectedMemoryParity:
    """Run A: identical (torch-built) memory injected into our engine."""

    @pytest.fixture(scope="class")
    def ours(self, fixture_env):
        from hbird_tpu import HbirdEvaluation

        env = fixture_env
        ev = HbirdEvaluation(
            _jax_extractor(env["w"]),
            list(env["train"]),
            num_classes=C,
            n_neighbours=K,
            augmentation_epoch=1,
            nn_method="faiss",
            f_mem_p=str(env["tmp"] / "ref_fmem.pt"),
            l_mem_p=str(env["tmp"] / "ref_lmem.pt"),
        )
        # Inject the reference's exact memory through the .pt parity hook.
        # (Our ctor just overwrote the .pt files? No: save_memory writes
        # torch format for .pt paths, and the contents are our build — so
        # re-write the reference's and reload.)
        torch.save(env["ref_ev"].feature_memory.cpu(), str(env["tmp"] / "ref_fmem.pt"))
        torch.save(env["ref_ev"].label_memory.cpu(), str(env["tmp"] / "ref_lmem.pt"))
        assert ev.load_memory() is True
        return ev

    def test_memory_bitwise_identical(self, fixture_env, ours):
        np.testing.assert_array_equal(
            np.asarray(ours.feature_memory),
            fixture_env["ref_ev"].feature_memory.numpy(),
        )
        np.testing.assert_array_equal(
            np.asarray(ours.label_memory),
            fixture_env["ref_ev"].label_memory.numpy(),
        )

    def test_neighbor_sets_identical(self, fixture_env, ours):
        """Same queries (reference backbone output) through both NN
        backends -> identical neighbor sets per query."""
        env = fixture_env
        x, _ = env["val"][0]
        feats, _ = env["ref_ev"].feature_extractor.forward_features(
            torch.from_numpy(x)
        )
        q = feats.reshape(-1, DM).numpy()
        ref_idx, _ = env["ref_ev"].NN_algorithm.find_nearest_neighbors(
            torch.from_numpy(q)
        )
        our_idx, _ = ours.NN_algorithm.find_nearest_neighbors(q, K)
        np.testing.assert_array_equal(
            np.sort(np.asarray(our_idx), -1), np.sort(ref_idx, -1)
        )

    def test_miou_matches_reference(self, fixture_env, ours):
        miou = ours.evaluate(list(fixture_env["val"]), S, ignore_index=255)
        assert abs(float(miou) - fixture_env["ref_miou"]) <= 1e-6, (
            float(miou), fixture_env["ref_miou"],
        )


class TestSelfBuiltMemoryParity:
    """Run B: each engine builds its own memory (deterministic loaders,
    unbounded memory -> only fp reduction order differs)."""

    def test_miou_close(self, fixture_env):
        from hbird_tpu import HbirdEvaluation

        env = fixture_env
        ev = HbirdEvaluation(
            _jax_extractor(env["w"]),
            list(env["train"]),
            num_classes=C,
            n_neighbours=K,
            augmentation_epoch=1,
            nn_method="faiss",
        )
        # Banks match to fp tolerance...
        np.testing.assert_allclose(
            np.asarray(ev.feature_memory),
            env["ref_ev"].feature_memory.numpy(),
            rtol=2e-5, atol=2e-6,
        )
        np.testing.assert_allclose(
            np.asarray(ev.label_memory),
            env["ref_ev"].label_memory.numpy(),
            rtol=1e-6, atol=1e-7,
        )
        # ...and the end metric agrees tightly.
        miou = ev.evaluate(list(env["val"]), S, ignore_index=255)
        assert abs(float(miou) - env["ref_miou"]) <= 5e-3, (
            float(miou), env["ref_miou"],
        )


class TestBoundedMemoryParity:
    """Run C: the BOUNDED-memory path (reference hbird_eval.py:330-355 +
    `_sample_features` :447-517). The reference's torch-CPU tie-break
    noise is recorded during its build and injected into our sampler, so
    the per-image patch SELECTION is proven identical — the one engine
    stage the unbounded runs A/B cannot cover."""

    K_SAMP = 6  # sampled patches per image (of S*S = 16)

    def _run_reference_bounded(self, ref_engine, env, monkeypatch):
        draws = []
        real_rand = torch.rand

        def record_rand(*a, **k):
            out = real_rand(*a, **k)
            draws.append(out.clone())
            return out

        monkeypatch.setattr(torch, "rand", record_rand)
        monkeypatch.setattr(
            ref_engine.HbirdEvaluation,
            "_create_nn",
            lambda self, n_neighbours=30, nn_method="faiss", **kw: setattr(
                self, "NN_algorithm",
                _TorchExactNN(self.feature_memory, n_neighbours),
            ),
        )
        t_train = [
            (torch.from_numpy(x), torch.from_numpy(y)) for x, y in env["train"]
        ]
        ev = ref_engine.HbirdEvaluation(
            _TorchBackbone(env["w"]),
            t_train,
            num_classes=C,
            n_neighbours=K,
            augmentation_epoch=1,
            device="cpu",
            nn_method="faiss",
            memory_size=N_TRAIN * self.K_SAMP,
            dataset_size=N_TRAIN,
        )
        monkeypatch.setattr(torch, "rand", real_rand)
        assert ev.num_sampled_features == self.K_SAMP
        # one torch.rand(total_nonzero) call per training batch
        assert len(draws) == N_TRAIN // BATCH
        assert all(d.numel() == BATCH * S * S for d in draws)
        return ev, draws

    def test_bounded_bank_and_miou_match(
        self, ref_engine, fixture_env, monkeypatch
    ):
        import jax

        import hbird_tpu.hbird_eval as he
        from hbird_tpu import HbirdEvaluation
        from hbird_tpu.core.sampling import (
            EMPTY_PATCH_SENTINEL, patch_sampling_scores,
        )

        env = fixture_env
        ref_ev, draws = self._run_reference_bounded(
            ref_engine, env, monkeypatch
        )

        # Inject the recorded noise: same (B, S*S) layout the reference
        # scatters its flat draw into (all patches non-empty after the
        # 255->0 fold, so the flat sequence is exactly row-major).
        calls = iter(draws)

        def injected_sample(key, feats, pgt, ncls, k):
            r = np.asarray(next(calls), np.float32)
            noise = jnp.asarray(r.reshape(feats.shape[0], feats.shape[1]))
            scores, nonzero = patch_sampling_scores(pgt, ncls)
            perturbed = jnp.where(
                nonzero, scores * noise, EMPTY_PATCH_SENTINEL
            )
            _, idx = jax.lax.top_k(-perturbed, k)
            sampled = jnp.take_along_axis(feats, idx[..., None], axis=1)
            return sampled, idx.astype(jnp.int32)

        monkeypatch.setattr(he, "sample_patches", injected_sample)
        fe = _jax_extractor(env["w"])
        fe.jittable = False  # eager steps: the injection consumes one
        # recorded draw per batch (a jitted step would bake the first)
        ours = HbirdEvaluation(
            fe,
            list(env["train"]),
            num_classes=C,
            n_neighbours=K,
            augmentation_epoch=1,
            nn_method="faiss",
            memory_size=N_TRAIN * self.K_SAMP,
            dataset_size=N_TRAIN,
        )
        # Identical patch selection -> labels match exactly; features to
        # fp tolerance (torch vs XLA matmul order inside the backbone).
        np.testing.assert_array_equal(
            np.asarray(ours.label_memory), ref_ev.label_memory.numpy()
        )
        np.testing.assert_allclose(
            np.asarray(ours.feature_memory),
            ref_ev.feature_memory.numpy(),
            rtol=2e-5, atol=2e-6,
        )
        ref_miou = float(ref_ev.evaluate(
            [(torch.from_numpy(x), torch.from_numpy(y)) for x, y in env["val"]],
            S, ignore_index=255,
        ))
        miou = float(ours.evaluate(list(env["val"]), S, ignore_index=255))
        assert abs(miou - ref_miou) <= 5e-3, (miou, ref_miou)
