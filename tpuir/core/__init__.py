from .tiling import tile_indices, gaussian_window
from .degrade import add_gaussian_noise, gaussian_noise_field
from .image_io import (
    imread_uint8,
    imread_uint16,
    imwrite_uint,
    normalize_image,
    restore_dtype,
)
from .metrics import psnr, ssim, calculate_metrics
from .engine import InferenceModel, run_model_inference
