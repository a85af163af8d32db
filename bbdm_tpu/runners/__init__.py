"""Runners: training/eval lifecycle engines (registered by name)."""

from bbdm_tpu.runners.base import BaseRunner  # noqa: F401
from bbdm_tpu.runners.diffusion_base import DiffusionBaseRunner  # noqa: F401
from bbdm_tpu.runners.bbdm import BBDMRunner  # noqa: F401
from bbdm_tpu.runners.vqgan import VQGANRunner  # noqa: F401
