"""uint8 host feed + on-device normalization (device_normalize pipelines).

The fast path ships uint8 CHW images and uint8 class-id masks; the engine
computes (x/255 - mean)/std inside the jitted step. Same formula, so the
results must match the float32 host-normalized path bit-for-bit (host) /
to fp tolerance (engine e2e).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hbird_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    get_hbird_train_transforms,
    get_hbird_val_transforms,
)


def _pil_pair(seed=0, size=(48, 64)):
    from PIL import Image

    rng = np.random.default_rng(seed)
    img = Image.fromarray(
        rng.integers(0, 255, size=(size[0], size[1], 3), dtype=np.uint8)
    )
    mask = Image.fromarray(
        rng.integers(0, 21, size=size, dtype=np.uint8), mode="L"
    )
    return img, mask


class TestPipelineDtypes:
    def test_val_u8_matches_f32_after_host_normalize(self):
        img, mask = _pil_pair()
        f32 = get_hbird_val_transforms(32)["pipeline"]
        u8 = get_hbird_val_transforms(32, device_normalize=True)["pipeline"]
        a_img, a_mask = f32(img, mask)
        b_img, b_mask = u8(img, mask)
        assert b_img.dtype == np.uint8 and b_img.shape == a_img.shape
        assert b_mask.dtype == np.uint8
        mean = np.asarray(IMAGENET_MEAN, np.float32).reshape(3, 1, 1)
        std = np.asarray(IMAGENET_STD, np.float32).reshape(3, 1, 1)
        manual = (b_img.astype(np.float32) / np.float32(255.0) - mean) / std
        np.testing.assert_array_equal(manual, a_img)
        np.testing.assert_array_equal(
            np.rint(a_mask * 255.0).astype(np.uint8), b_mask
        )

    def test_train_u8_shapes_and_mask_ids(self):
        import random

        img, mask = _pil_pair(1)
        random.seed(7)
        u8 = get_hbird_train_transforms(32, device_normalize=True)["pipeline"]
        b_img, b_mask = u8(img, mask)
        assert b_img.dtype == np.uint8 and b_img.shape == (3, 32, 32)
        assert b_mask.dtype == np.uint8 and b_mask.shape == (1, 32, 32)
        assert b_mask.max() <= 20


class TestEngineU8Parity:
    def test_engine_results_match_f32_path(self):
        """Same deterministic batches through the engine in both feeds ->
        identical mIoU (normalization formula is identical in f32)."""
        from hbird_tpu import HbirdEvaluation
        from hbird_tpu.models import FeatureExtractorSimple

        B, INPUT, PATCH, C, D, K = 2, 16, 4, 5, 12, 3
        S = INPUT // PATCH
        rng = np.random.default_rng(3)
        w = rng.normal(size=(3 * PATCH * PATCH, D)).astype(np.float32)

        def fn(model, imgs):
            b = imgs.shape[0]
            xx = imgs.reshape(b, 3, S, PATCH, S, PATCH)
            xx = xx.transpose(0, 2, 4, 1, 3, 5).reshape(b, S * S, -1)
            return xx @ model, None

        fe = FeatureExtractorSimple(
            jnp.asarray(w), fn, eval_spatial_resolution=S, d_model=D
        )

        imgs_u8 = rng.integers(0, 255, size=(3 * B, 3, INPUT, INPUT), dtype=np.uint8)
        ids = rng.integers(0, C, size=(3 * B, 1, INPUT, INPUT)).astype(np.uint8)
        mean = np.asarray(IMAGENET_MEAN, np.float32).reshape(1, 3, 1, 1)
        std = np.asarray(IMAGENET_STD, np.float32).reshape(1, 3, 1, 1)
        imgs_f32 = (imgs_u8.astype(np.float32) / np.float32(255.0) - mean) / std
        masks_f32 = (ids / 255.0).astype(np.float32)

        def batches(x, y):
            return [(x[i : i + B], y[i : i + B]) for i in range(0, len(x), B)]

        mious = []
        for x, y in ((imgs_u8, ids), (imgs_f32, masks_f32)):
            ev = HbirdEvaluation(
                fe, batches(x, y)[:2], num_classes=C, n_neighbours=K,
                nn_method="exact",
            )
            mious.append(
                float(ev.evaluate(batches(x, y)[2:], S, ignore_index=255))
            )
        assert mious[0] == pytest.approx(mious[1], abs=1e-6), mious
