from vspbfr_tpu.data.degradations import (
    bivariate_gaussian_kernel,
    bivariate_generalized_gaussian_kernel,
    bivariate_plateau_kernel,
    circular_lowpass_kernel,
    random_mixed_kernel,
    add_gaussian_noise,
    add_poisson_noise,
    add_jpeg_compression,
    DegradationConfig,
    degrade_image,
)
from vspbfr_tpu.data.datasets import (
    RestoreTrainDataset,
    RestoreTestDataset,
    list_images,
    DataLoader,
)

__all__ = [
    "bivariate_gaussian_kernel",
    "bivariate_generalized_gaussian_kernel",
    "bivariate_plateau_kernel",
    "circular_lowpass_kernel",
    "random_mixed_kernel",
    "add_gaussian_noise",
    "add_poisson_noise",
    "add_jpeg_compression",
    "DegradationConfig",
    "degrade_image",
    "RestoreTrainDataset",
    "RestoreTestDataset",
    "list_images",
    "DataLoader",
]
