from diffusioniqt_tpu.train.trainer import ImagenTrainer  # noqa: F401
from diffusioniqt_tpu.train.ema import EMAState, ema_decay_schedule, ema_update  # noqa: F401
