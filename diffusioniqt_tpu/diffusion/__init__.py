from diffusioniqt_tpu.diffusion.gaussian import Imagen  # noqa: F401
from diffusioniqt_tpu.diffusion.elucidated import ElucidatedImagen  # noqa: F401
