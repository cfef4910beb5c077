"""dehaze_tpu — a TPU-native (JAX/XLA/Pallas/pjit) image-dehazing framework.

A from-scratch rebuild of the capabilities of
`xin-fight/Research-and-Implementation-of-Image-Dehazing-Algorithm-Based-on-Vision-Transformer`
(a PyTorch Uformer+ProbSparse dehazing stack), re-designed TPU-first:

- functional Flax models (NHWC layouts, static shapes, bf16 compute / f32 state)
- dense-masked ProbSparse window attention (MXU-friendly: no gather/scatter)
- Pallas fused window-attention kernels for the hot path
- SPMD data parallelism over a `jax.sharding.Mesh` (ICI), not DataParallel
- host-side NumPy/OpenCV input pipeline with device prefetch
- Orbax-style checkpointing, loss-landscape analysis, PSNR/SSIM metrics in jnp

Reference parity map lives in SURVEY.md §2; each module cites the reference
file:line whose behavior it reproduces.
"""

__version__ = "0.1.0"

from dehaze_tpu.utils.cache import enable_compilation_cache as _enable_cache

_enable_cache()

from dehaze_tpu.config import (  # noqa: F401
    DataConfig,
    LossConfig,
    ModelConfig,
    TrainConfig,
)
