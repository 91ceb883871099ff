from .loaders import (
    DataLoader,
    gaussian_noise_dataset_loader,
    real_noise_dataset_loader,
    defocus_blur_dataset_loader,
    motion_blur_dataset_loader,
)
