"""Data pipelines: SalData (CSNet), .lst datasets (CSF), device front-end."""

from .pipeline import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    Augment,
    SalData,
    batches,
    device_prefetch,
    preprocess_test_image,
    resize_bilinear_np,
)

__all__ = [
    "IMAGENET_MEAN", "IMAGENET_STD", "Augment", "SalData", "batches",
    "device_prefetch", "preprocess_test_image", "resize_bilinear_np",
]
