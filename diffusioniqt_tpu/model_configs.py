"""Config-driven model creation (reference ``configs.py`` capability).

The reference ships pydantic schemas with ``.create()`` factories
(``/root/reference/configs.py:44-181``, vestigial there). This is the
working dataclass equivalent: JSON/dict-driven construction of U-Nets,
Imagen/ElucidatedImagen wrappers, and the trainer — used by the CLI.
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields
from typing import Any, Dict, List, Optional, Tuple, Union


def _filter_kwargs(klass, kwargs: dict) -> dict:
    names = {f.name for f in fields(klass)}
    return {k: v for k, v in kwargs.items() if k in names}


@dataclass
class UnetConfig:
    """Schema for a single U-Net stage (reference configs.py:44-66)."""

    dim: int = 64
    dim_mults: Tuple[int, ...] = (1, 2, 4)
    channels: int = 1
    kind: str = "unet3d"  # 'unet3d' | 'unet2d' | 'video' | 'null'
    kwargs: Dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, raw: dict) -> "UnetConfig":
        known = _filter_kwargs(cls, raw)
        extra = {k: v for k, v in raw.items()
                 if k not in known and k != "kwargs"}
        known.setdefault("kwargs", {}).update(extra)
        if isinstance(known.get("dim_mults"), list):
            known["dim_mults"] = tuple(known["dim_mults"])
        return cls(**known)

    def create(self):
        if self.kind == "null":
            from diffusioniqt_tpu.models.unet3d import NullUnet

            return NullUnet()
        if self.kind == "unet2d":
            from diffusioniqt_tpu.models.unet2d import UNet2D

            return UNet2D(dim=self.dim, dim_mults=self.dim_mults,
                          channels=self.channels,
                          **_filter_kwargs(UNet2D, self.kwargs))
        if self.kind == "video":
            from diffusioniqt_tpu.models.unet_video import Unet3DVideo

            return Unet3DVideo(dim=self.dim, dim_mults=self.dim_mults,
                               channels=self.channels,
                               **_filter_kwargs(Unet3DVideo, self.kwargs))
        from diffusioniqt_tpu.models.unet3d import UNet3D

        return UNet3D(dim=self.dim, dim_mults=self.dim_mults,
                      channels=self.channels,
                      **_filter_kwargs(UNet3D, self.kwargs))


@dataclass
class ImagenConfig:
    """Schema for the cascade wrapper (reference configs.py:68-106)."""

    unets: List[dict] = field(default_factory=list)
    image_sizes: Tuple[int, ...] = (32,)
    channels: int = 1
    timesteps: Union[int, Tuple[int, ...]] = 1000
    noise_schedules: Union[str, Tuple[str, ...]] = "cosine"
    pred_objectives: Union[str, Tuple[str, ...]] = "noise"
    loss_type: str = "l2"
    cond_drop_prob: float = 0.1
    auto_normalize_img: bool = False
    dynamic_thresholding: bool = True
    min_bound: float = 0.0
    norm: str = "z-score"
    batch_sample: bool = False

    @classmethod
    def from_dict(cls, raw: dict) -> "ImagenConfig":
        kw = _filter_kwargs(cls, raw)
        for key in ("image_sizes", "timesteps", "noise_schedules",
                    "pred_objectives"):
            if isinstance(kw.get(key), list):
                kw[key] = tuple(kw[key])
        return cls(**kw)

    def create(self):
        from diffusioniqt_tpu.diffusion.gaussian import Imagen

        unets = [UnetConfig.from_dict(u).create() for u in self.unets]
        return Imagen(
            unets, image_sizes=self.image_sizes, channels=self.channels,
            timesteps=self.timesteps, noise_schedules=self.noise_schedules,
            pred_objectives=self.pred_objectives, loss_type=self.loss_type,
            cond_drop_prob=self.cond_drop_prob,
            auto_normalize_img=self.auto_normalize_img,
            dynamic_thresholding=self.dynamic_thresholding,
            min_bound=self.min_bound, norm=self.norm,
            batch_sample=self.batch_sample,
        )


@dataclass
class ElucidatedImagenConfig:
    """Schema for the EDM wrapper (reference configs.py:108-156)."""

    unets: List[dict] = field(default_factory=list)
    image_sizes: Tuple[int, ...] = (32,)
    channels: int = 1
    cond_drop_prob: float = 0.1
    num_sample_steps: Union[int, Tuple[int, ...]] = 32
    sigma_min: Union[float, Tuple[float, ...]] = 0.002
    sigma_max: Union[float, Tuple[float, ...]] = 80.0
    sigma_data: Union[float, Tuple[float, ...]] = 0.5
    rho: Union[float, Tuple[float, ...]] = 7.0
    P_mean: Union[float, Tuple[float, ...]] = -1.2
    P_std: Union[float, Tuple[float, ...]] = 1.2
    S_churn: Union[float, Tuple[float, ...]] = 80.0
    S_tmin: Union[float, Tuple[float, ...]] = 0.05
    S_tmax: Union[float, Tuple[float, ...]] = 50.0
    S_noise: Union[float, Tuple[float, ...]] = 1.003
    auto_normalize_img: bool = True
    dynamic_thresholding: bool = True
    norm: str = "min-max"

    @classmethod
    def from_dict(cls, raw: dict) -> "ElucidatedImagenConfig":
        kw = _filter_kwargs(cls, raw)
        if isinstance(kw.get("image_sizes"), list):
            kw["image_sizes"] = tuple(kw["image_sizes"])
        return cls(**kw)

    def create(self):
        from diffusioniqt_tpu.diffusion.elucidated import ElucidatedImagen

        unets = [UnetConfig.from_dict(u).create() for u in self.unets]
        kw = {f.name: getattr(self, f.name) for f in fields(self)
              if f.name != "unets"}
        return ElucidatedImagen(unets, **kw)


@dataclass
class ImagenTrainerConfig:
    """Schema for the trainer (reference configs.py:158-181)."""

    imagen: dict = field(default_factory=dict)
    elucidated: bool = False
    use_ema: bool = True
    lr: float = 1e-4
    eps: float = 1e-8
    beta1: float = 0.9
    beta2: float = 0.99
    max_grad_norm: Optional[float] = None
    gradient_accumulation_steps: int = 4
    warmup_steps: Optional[int] = None
    cosine_decay_max_steps: Optional[int] = None

    @classmethod
    def from_dict(cls, raw: dict) -> "ImagenTrainerConfig":
        return cls(**_filter_kwargs(cls, raw))

    def create(self):
        from diffusioniqt_tpu.train.trainer import ImagenTrainer

        if self.elucidated:
            imagen = ElucidatedImagenConfig.from_dict(self.imagen).create()
        else:
            imagen = ImagenConfig.from_dict(self.imagen).create()
        return ImagenTrainer(
            imagen=imagen, use_ema=self.use_ema, lr=self.lr, eps=self.eps,
            beta1=self.beta1, beta2=self.beta2,
            max_grad_norm=self.max_grad_norm,
            gradient_accumulation_steps=self.gradient_accumulation_steps,
            warmup_steps=self.warmup_steps,
            cosine_decay_max_steps=self.cosine_decay_max_steps,
        )
