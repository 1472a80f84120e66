"""Host-side paired image/mask transforms (PIL + numpy, no torch).

Re-implements the reference's transform factories
(hbird/utils/transforms.py:85-295) and paired primitives
(hbird/utils/image_transformations.py:90-297) for a numpy data feed:

- train: 4x independently-gated color jitters (p=0.5, range 0.1) ->
  ToTensor+Normalize; shared paired RandomResizedCrop(scale=(0.5, 2.0)),
  bilinear for images / nearest for masks.
- val: deterministic resize (bilinear antialiased for images, nearest for
  masks) -> ToTensor+Normalize.

Parity notes:
- IMAGENET_STD keeps the reference's STD[2]=0.255 value by default
  (reference transforms.py:29 — a typo vs the canonical 0.225, but the
  published results were produced with it). Pass
  `img_std=IMAGENET_STD_CANONICAL` to get the textbook constant.
- Masks become float32 in [0, 1] (class_id / 255), matching the
  reference's ToTensor mask convention (image_transformations.py:39-49);
  the engine multiplies by 255 (exact for all uint8 values in fp32).
- Mask nearest-resize uses torch's floor convention
  (src = floor(dst * in/out)), matching F.resize(tensor, NEAREST).
- Image geometry runs on PIL/uint8 *before* normalization; the reference
  crops the normalized float tensor. Because normalization is affine and
  the resize is linear, results differ only by uint8 quantization
  (<= 0.5/255 per pixel).
- RNG: stdlib `random` module (seeded by set_seed), like torchvision.
"""

from __future__ import annotations

import math
import random
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
from PIL import Image, ImageEnhance

IMAGENET_MEAN = [0.485, 0.456, 0.406]
IMAGENET_STD = [0.229, 0.224, 0.255]  # reference value (STD[2] typo kept)
IMAGENET_STD_CANONICAL = [0.229, 0.224, 0.225]

ImageLike = Union[Image.Image, np.ndarray]


# ---------------------------------------------------------------------------
# Elemental ops (torchvision-PIL-parity)
# ---------------------------------------------------------------------------


def adjust_brightness(img: Image.Image, factor: float) -> Image.Image:
    return ImageEnhance.Brightness(img).enhance(factor)


def adjust_contrast(img: Image.Image, factor: float) -> Image.Image:
    return ImageEnhance.Contrast(img).enhance(factor)


def adjust_saturation(img: Image.Image, factor: float) -> Image.Image:
    return ImageEnhance.Color(img).enhance(factor)


def adjust_hue(img: Image.Image, hue_factor: float) -> Image.Image:
    """Shift hue by hue_factor in [-0.5, 0.5] (uint8 wraparound in HSV)."""
    if not -0.5 <= hue_factor <= 0.5:
        raise ValueError(f"hue_factor {hue_factor} not in [-0.5, 0.5]")
    h, s, v = img.convert("HSV").split()
    h_np = np.array(h, dtype=np.uint8)
    h_np = (h_np.astype(np.int16) + int(round(hue_factor * 255))).astype(np.uint8)
    return Image.merge("HSV", (Image.fromarray(h_np, "L"), s, v)).convert(img.mode)


def to_tensor(img: Image.Image) -> np.ndarray:
    """PIL -> float32 CHW in [0, 1] (ToTensor semantics)."""
    arr = np.asarray(img, dtype=np.float32) / np.float32(255.0)
    if arr.ndim == 2:
        arr = arr[None]
    else:
        arr = arr.transpose(2, 0, 1)
    return np.ascontiguousarray(arr)


def normalize(chw: np.ndarray, mean: Sequence[float], std: Sequence[float]) -> np.ndarray:
    mean = np.asarray(mean, np.float32).reshape(-1, 1, 1)
    std = np.asarray(std, np.float32).reshape(-1, 1, 1)
    return (chw - mean) / std


def mask_to_tensor(mask: ImageLike) -> np.ndarray:
    """Mask (PIL 'P'/'L' or numpy HxW) -> float32 (1, H, W) of class_id/255."""
    if isinstance(mask, np.ndarray):
        arr = mask.astype(np.float32)
        if arr.max(initial=0.0) > 1.0:
            arr = arr / np.float32(255.0)
        return arr[None] if arr.ndim == 2 else arr
    return np.asarray(mask, dtype=np.float32)[None] / np.float32(255.0)


def nearest_resize(mask: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Nearest resize with torch's floor convention (src = floor(dst*in/out)).

    Args:
        mask: (..., H, W).
        size: (out_h, out_w).
    """
    h, w = mask.shape[-2:]
    oh, ow = size
    if (h, w) == (oh, ow):
        return mask
    ri = np.minimum((np.arange(oh) * (h / oh)).astype(np.int64), h - 1)
    ci = np.minimum((np.arange(ow) * (w / ow)).astype(np.int64), w - 1)
    return mask[..., ri[:, None], ci[None, :]]


def pil_resize_bilinear(img: Image.Image, size: Tuple[int, int]) -> Image.Image:
    """Antialiased bilinear resize (PIL resamples with a proper filter)."""
    oh, ow = size
    if img.size == (ow, oh):
        return img
    return img.resize((ow, oh), Image.BILINEAR)


def random_resized_crop_params(
    img_hw: Tuple[int, int],
    scale: Tuple[float, float],
    ratio: Tuple[float, float],
    rng: random.Random | None = None,
) -> Tuple[int, int, int, int]:
    """Sample (i, j, h, w) like torchvision RandomResizedCrop.get_params."""
    r = rng or random
    height, width = img_hw
    area = height * width
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * r.uniform(scale[0], scale[1])
        aspect = math.exp(r.uniform(log_ratio[0], log_ratio[1]))
        w = int(round(math.sqrt(target_area * aspect)))
        h = int(round(math.sqrt(target_area / aspect)))
        if 0 < w <= width and 0 < h <= height:
            i = r.randint(0, height - h)
            j = r.randint(0, width - w)
            return i, j, h, w
    # Fallback: center crop at the closest valid aspect.
    in_ratio = width / height
    if in_ratio < ratio[0]:
        w = width
        h = int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        h = height
        w = int(round(h * ratio[1]))
    else:
        w, h = width, height
    i = (height - h) // 2
    j = (width - w) // 2
    return i, j, h, w


# ---------------------------------------------------------------------------
# Paired functional ops (image PIL, target numpy)
# ---------------------------------------------------------------------------


def _ensure_mask_array(target: ImageLike) -> np.ndarray:
    return mask_to_tensor(target)


def resize_pair(image: Image.Image, target: ImageLike, size: Tuple[int, int]):
    """Deterministic paired resize: bilinear image / nearest target."""
    target = _ensure_mask_array(target)
    image = pil_resize_bilinear(image, size)
    target = nearest_resize(target, size)
    return image, target


def random_resize_crop_pair(
    image: Image.Image,
    target: ImageLike,
    size: Tuple[int, int] = (256, 256),
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
):
    """One crop-parameter draw applied consistently to image and target."""
    target = _ensure_mask_array(target)
    i, j, h, w = random_resized_crop_params(
        (image.height, image.width), scale, ratio
    )
    image = image.crop((j, i, j + w, i + h))
    image = pil_resize_bilinear(image, size)
    target = nearest_resize(target[..., i : i + h, j : j + w], size)
    return image, target


def hflip_pair(image: Image.Image, target: ImageLike):
    target = _ensure_mask_array(target)
    return image.transpose(Image.FLIP_LEFT_RIGHT), target[..., ::-1].copy()


# Reference-named aliases (hbird/utils/image_transformations.py:90-164).
random_resize_crop = random_resize_crop_pair
resize = resize_pair
apply_horizontal_flip = hflip_pair


# ---------------------------------------------------------------------------
# Transform classes (public API parity with the reference)
# ---------------------------------------------------------------------------


class RandomApply:
    def __init__(self, fn, p: float = 0.5):
        self.fn = fn
        self.p = float(p)

    def __call__(self, img):
        if random.random() < self.p:
            return self.fn(img)
        return img


class ColorJitterSingle:
    """One-parameter color jitter (factor drawn per call), torchvision ranges."""

    def __init__(self, kind: str, value: float):
        assert kind in ("brightness", "contrast", "saturation", "hue")
        self.kind = kind
        self.value = float(value)

    def __call__(self, img: Image.Image) -> Image.Image:
        if self.kind == "hue":
            factor = random.uniform(-self.value, self.value)
            return adjust_hue(img, factor)
        lo, hi = max(0.0, 1 - self.value), 1 + self.value
        factor = random.uniform(lo, hi)
        return {
            "brightness": adjust_brightness,
            "contrast": adjust_contrast,
            "saturation": adjust_saturation,
        }[self.kind](img, factor)


class ImgCompose:
    """Compose image-only transforms (PIL -> ... -> numpy tensor)."""

    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, img):
        for t in self.transforms:
            img = t(img)
        return img


class ToTensor:
    def __call__(self, img):
        return to_tensor(img) if isinstance(img, Image.Image) else img


class Normalize:
    def __init__(self, mean, std):
        self.mean, self.std = mean, std

    def __call__(self, chw):
        return normalize(chw, self.mean, self.std)


class PILResize:
    def __init__(self, size, antialias: bool = True):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, img):
        return pil_resize_bilinear(img, self.size)


class RandomResizedCrop:
    """Paired random resized crop (probability-gated, reference parity:
    image_transformations.py:169-196)."""

    def __init__(self, size, scale=(0.5, 2), ratio=(3.0 / 4.0, 4.0 / 3.0), probability=1.0):
        self.size = (size, size) if isinstance(size, int) else tuple(size)
        self.scale = scale
        self.ratio = ratio
        self.probability = float(probability)

    def __call__(self, img, target):
        if random.random() < self.probability:
            return random_resize_crop_pair(img, target, self.size, self.scale, self.ratio)
        return img, target


class RandomHorizontalFlip:
    def __init__(self, probability: float = 0.5):
        self.probability = float(probability)

    def __call__(self, img, target):
        if random.random() < self.probability:
            return hflip_pair(img, target)
        return img, target


class Compose:
    """Compose paired (img, target) transforms."""

    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, img, target):
        for t in self.transforms:
            img, target = t(img, target)
        return img, target


class Resize:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, img, target):
        return resize_pair(img, target, self.size)


class CombTransforms:
    """Combine img-only / target-only / paired transform slots
    (reference image_transformations.py:260-297).

    The paired slot runs last; by then the image may already be a numpy
    tensor (ToTensor in the img slot) — paired geometry classes here accept
    PIL images only in the img position, so factories order PIL geometry
    before ToTensor."""

    def __init__(self, img_transform=None, tgt_transform=None, img_tgt_transform=None):
        self.img_transform = img_transform
        self.tgt_transform = tgt_transform
        self.img_tgt_transform = img_tgt_transform

    def __call__(self, img, tgt):
        if self.img_transform:
            img = self.img_transform(img)
        if self.tgt_transform:
            tgt = self.tgt_transform(tgt)
        if self.img_tgt_transform:
            return self.img_tgt_transform(img, tgt)
        return img, tgt


class _PairedGeometryThenTensor:
    """Shared-geometry pipeline that keeps the image in PIL space through
    the paired geometry, then applies the tensor/normalize tail.

    The reference runs paired geometry on the normalized float tensor; we
    run it on PIL/uint8 *then* normalize — affine-equivalent modulo uint8
    rounding (see module docstring).

    With ``device_normalize=True`` the tensor/normalize tail is SKIPPED and
    the pipeline emits uint8 CHW images + uint8 class-id masks: the engine
    applies (x/255 - mean)/std on-device inside the jitted step. Host ->
    device traffic drops 4x (f32 -> u8) — on bandwidth-limited links the
    dominant cost of the memory build — and the normalize rides free on
    the TPU. Numerically identical formula evaluated in f32 either way."""

    def __init__(self, img_pre, paired, img_post, device_normalize: bool = False):
        self.img_pre = ImgCompose(img_pre)  # PIL -> PIL (color jitter)
        self.paired = Compose(paired)  # (PIL, mask) geometry
        self.img_post = ImgCompose(img_post)  # ToTensor/Normalize
        self.device_normalize = device_normalize

    def __call__(self, img, tgt):
        img = self.img_pre(img)
        img, tgt = self.paired(img, tgt)
        if self.device_normalize:
            arr = np.asarray(img, np.uint8)
            if arr.ndim == 2:
                arr = np.repeat(arr[..., None], 3, axis=-1)
            img_u8 = np.ascontiguousarray(arr.transpose(2, 0, 1))  # CHW u8
            tgt = _ensure_mask_array(tgt)  # float (1,H,W) of id/255
            tgt_u8 = np.rint(tgt * np.float32(255.0)).astype(np.uint8)
            return img_u8, tgt_u8
        return self.img_post(img), tgt


# ---------------------------------------------------------------------------
# Factories (public API parity: get_hbird_* / get_default_*)
# ---------------------------------------------------------------------------


def _color_jitter_block(b, c, s, h, pb, pc, ps, ph) -> List[RandomApply]:
    return [
        RandomApply(ColorJitterSingle("brightness", b), p=pb),
        RandomApply(ColorJitterSingle("contrast", c), p=pc),
        RandomApply(ColorJitterSingle("saturation", s), p=ps),
        RandomApply(ColorJitterSingle("hue", h), p=ph),
    ]


def get_hbird_train_transforms(
    input_size: int = 224,
    min_scale_factor: float = 0.5,
    max_scale_factor: float = 2.0,
    brightness_jitter_range: float = 0.1,
    contrast_jitter_range: float = 0.1,
    saturation_jitter_range: float = 0.1,
    hue_jitter_range: float = 0.1,
    brightness_jitter_probability: float = 0.5,
    contrast_jitter_probability: float = 0.5,
    saturation_jitter_probability: float = 0.5,
    hue_jitter_probability: float = 0.5,
    img_mean: list = IMAGENET_MEAN,
    img_std: list = IMAGENET_STD,
    device_normalize: bool = False,
) -> Dict[str, Optional[object]]:
    """Train transforms: color jitter + shared paired RandomResizedCrop.

    Returns {"img", "target", "shared"} like the reference
    (transforms.py:166-212). The "img" entry is the color-jitter+tensor
    pipeline and "shared" the paired geometry; combine with CombTransforms
    or use `build_train_pipeline` for the PIL-ordered fused pipeline.
    With `device_normalize=True` the pipeline emits uint8 batches and the
    engine normalizes on-device (4x less host->device traffic); the
    returned dict carries the (mean, std) under "device_norm".
    """
    jitters = _color_jitter_block(
        brightness_jitter_range,
        contrast_jitter_range,
        saturation_jitter_range,
        hue_jitter_range,
        brightness_jitter_probability,
        contrast_jitter_probability,
        saturation_jitter_probability,
        hue_jitter_probability,
    )
    shared = Compose(
        [
            RandomResizedCrop(
                size=(input_size, input_size),
                scale=(min_scale_factor, max_scale_factor),
            ),
            # RandomHorizontalFlip(probability=0.1),  # opt-in (reference keeps it off)
        ]
    )
    pipeline = _PairedGeometryThenTensor(
        img_pre=jitters,
        paired=shared.transforms,
        img_post=[ToTensor(), Normalize(img_mean, img_std)],
        device_normalize=device_normalize,
    )
    return {
        "img": ImgCompose([*jitters, ToTensor(), Normalize(img_mean, img_std)]),
        "target": None,
        "shared": shared,
        "pipeline": pipeline,
        "device_norm": (img_mean, img_std) if device_normalize else None,
    }


def get_hbird_val_transforms(
    input_size: int = 224,
    img_mean: list = IMAGENET_MEAN,
    img_std: list = IMAGENET_STD,
    device_normalize: bool = False,
) -> Dict[str, Optional[object]]:
    """Val transforms: deterministic resize + tensor/normalize
    (reference transforms.py:215-236)."""
    shared = Compose([Resize(size=(input_size, input_size))])
    pipeline = _PairedGeometryThenTensor(
        img_pre=[],
        paired=shared.transforms,
        img_post=[ToTensor(), Normalize(img_mean, img_std)],
        device_normalize=device_normalize,
    )
    return {
        "img": ImgCompose(
            [PILResize((input_size, input_size)), ToTensor(), Normalize(img_mean, img_std)]
        ),
        "target": None,
        "shared": shared,
        "pipeline": pipeline,
        "device_norm": (img_mean, img_std) if device_normalize else None,
    }


def get_hbird_train_transforms_for_imgs(
    input_size: int = 224,
    min_scale_factor: float = 0.5,
    max_scale_factor: float = 2.0,
    brightness_jitter_range: float = 0.1,
    contrast_jitter_range: float = 0.1,
    saturation_jitter_range: float = 0.1,
    hue_jitter_range: float = 0.1,
    brightness_jitter_probability: float = 0.5,
    contrast_jitter_probability: float = 0.5,
    saturation_jitter_probability: float = 0.5,
    hue_jitter_probability: float = 0.5,
    img_mean: list = IMAGENET_MEAN,
    img_std: list = IMAGENET_STD,
) -> Dict[str, Optional[object]]:
    """Image-only train transforms (reference transforms.py:85-124)."""

    class _ImgRRC:
        def __init__(self, size, scale):
            self.size, self.scale = size, scale

        def __call__(self, img):
            i, j, h, w = random_resized_crop_params(
                (img.height, img.width), self.scale, (3.0 / 4.0, 4.0 / 3.0)
            )
            return pil_resize_bilinear(img.crop((j, i, j + w, i + h)), self.size)

    jitters = _color_jitter_block(
        brightness_jitter_range,
        contrast_jitter_range,
        saturation_jitter_range,
        hue_jitter_range,
        brightness_jitter_probability,
        contrast_jitter_probability,
        saturation_jitter_probability,
        hue_jitter_probability,
    )
    img_t = ImgCompose(
        [
            _ImgRRC((input_size, input_size), (min_scale_factor, max_scale_factor)),
            *jitters,
            ToTensor(),
            Normalize(img_mean, img_std),
        ]
    )
    return {"img": img_t, "target": None, "shared": None}


def get_hbird_transforms(input_size: int = 224, *args, **kwargs):
    """(train, val, test) transform dicts (reference transforms.py:127-163)."""
    train = get_hbird_train_transforms(input_size, *args, **kwargs)
    val = get_hbird_val_transforms(input_size)
    test = get_hbird_val_transforms(input_size)
    return train, val, test


def get_default_train_transforms(
    input_size: int = 224,
    img_mean: list = IMAGENET_MEAN,
    img_std: list = IMAGENET_STD,
    min_scale_factor: float = 0.5,
    max_scale_factor: float = 2.0,
) -> Dict[str, Optional[object]]:
    shared = Compose(
        [
            RandomResizedCrop(
                size=(input_size, input_size),
                scale=(min_scale_factor, max_scale_factor),
            )
        ]
    )
    pipeline = _PairedGeometryThenTensor(
        img_pre=[],
        paired=shared.transforms,
        img_post=[ToTensor(), Normalize(img_mean, img_std)],
    )
    return {
        "img": ImgCompose([ToTensor(), Normalize(img_mean, img_std)]),
        "target": None,
        "shared": shared,
        "pipeline": pipeline,
    }


def get_default_val_transforms(
    input_size: int = 224,
    img_mean: list = IMAGENET_MEAN,
    img_std: list = IMAGENET_STD,
) -> Dict[str, Optional[object]]:
    return get_hbird_val_transforms(input_size, img_mean, img_std)


def get_default_transforms(
    input_size: int = 224,
    img_mean: list = IMAGENET_MEAN,
    img_std: list = IMAGENET_STD,
):
    train = get_default_train_transforms(input_size, img_mean, img_std)
    val = get_default_val_transforms(input_size, img_mean, img_std)
    test = get_default_val_transforms(input_size, img_mean, img_std)
    return train, val, test
