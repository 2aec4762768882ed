from diffusioniqt_tpu.models.unet3d import NullUnet, SRUnet256, UNet3D  # noqa: F401
