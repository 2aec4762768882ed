from diffusioniqt_tpu.utils.misc import (  # noqa: F401
    cast_tuple,
    default,
    exists,
    mish,
)
