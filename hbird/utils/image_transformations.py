from hbird_tpu.data.transforms import (
    CombTransforms,
    Compose,
    RandomHorizontalFlip,
    RandomResizedCrop,
    Resize,
    apply_horizontal_flip,
    random_resize_crop,
    resize,
)
