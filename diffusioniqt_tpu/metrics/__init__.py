from diffusioniqt_tpu.metrics.image import MSSIM, PSNR, SSIM, psnr, ssim3d  # noqa: F401
