"""diffusioniqt_tpu — TPU-native 3D conditional diffusion for Image Quality Transfer.

A ground-up JAX / Flax / optax / Pallas re-design of the capabilities of
edshkim98/DiffusionIQT (NeurIPS DGM4H 2023): patch-based 3D conditional
diffusion that enhances low-field brain MRI to high-field quality.

Layout convention: volumes are channels-last ``(B, X, Y, Z, C)`` (TPU-friendly
NDHWC). The PyTorch reference uses ``(B, C, H, W, D)``; use
``diffusioniqt_tpu.ops.volume.{from_torch_layout,to_torch_layout}`` at the
boundary when comparing.

Top-level re-exports cover the reference's public surface
(``imagen_pytorch3D.py`` / ``elucidated_imagen.py`` / ``trainer.py``).
"""

__version__ = "0.1.0"

from diffusioniqt_tpu.config import Config, load_config  # noqa: F401
from diffusioniqt_tpu.core.schedules import GaussianDiffusionContinuousTimes  # noqa: F401
