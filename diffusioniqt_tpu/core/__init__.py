from diffusioniqt_tpu.core.schedules import (  # noqa: F401
    GaussianDiffusionContinuousTimes,
    alpha_cosine_log_snr,
    beta_linear_log_snr,
    log_snr_to_alpha_sigma,
    right_pad_dims_to,
)
from diffusioniqt_tpu.core.edm import EDMParams  # noqa: F401
