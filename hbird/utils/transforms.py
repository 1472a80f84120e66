from hbird_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    get_default_train_transforms,
    get_default_transforms,
    get_default_val_transforms,
    get_hbird_train_transforms,
    get_hbird_train_transforms_for_imgs,
    get_hbird_transforms,
    get_hbird_val_transforms,
)
from hbird_tpu.data.transforms import (  # noqa: E402  (reference re-exports, transforms.py:20-26)
    Compose,
    RandomHorizontalFlip,
    RandomResizedCrop,
    Resize,
)
