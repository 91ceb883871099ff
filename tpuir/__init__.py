"""tpuir — TPU-native image restoration zoo (JAX / Flax / Pallas).

A brand-new TPU-first framework with the capabilities of the PyTorch reference
``leducthanhig/image-restoration-models``: five restoration model families
(REDNet, DnCNN, DeblurGANv2, Restormer, MaIR) driven by a single jit-compiled
batched tiled-inference engine, with weight converters for the originally
released checkpoints, an evaluation harness, a Gradio demo, and a training
framework (the TPU-native equivalent of the vendored BasicSR forks).

Layout:
  core/      tiled inference engine, AWGN degradation, image IO, metrics
  ops/       functional JAX ops + Pallas TPU kernels (selective scan, MDTA, ...)
  models/    Flax model definitions
  weights/   checkpoint converters (torch pickle -> pytree, caffemodel -> pytree)
  data/      dataset loaders
  parallel/  device mesh / sharding helpers (pjit over the patch grid, DP)
  train/     training framework: losses, schedulers, trainer, EMA, logging
  utils/     small host-side utilities
"""

__version__ = "0.1.0"
