"""Model zoo: Brownian-bridge diffusion (pixel + latent), UNet denoiser, VQGAN."""

from bbdm_tpu.models.factory import build_model  # noqa: F401
