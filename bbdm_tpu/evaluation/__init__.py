"""Offline evaluation harness (reference `evaluation/` +
`preprocess_and_evaluation.py`): FID, LPIPS, diversity over the
``sample_to_eval`` directory contract, plus weights-free pixel metrics.

The reference shells out to the ``pytorch_fid`` and ``lpips`` pip packages
with downloaded pretrained backbones; here the backbones (FID InceptionV3,
LPIPS AlexNet/VGG16) are JAX ports that load converted torch weights from a
user-supplied path (``BBDM_FID_WEIGHTS`` / ``BBDM_LPIPS_WEIGHTS`` env vars or
function args) — this environment has no network egress, so no weights ship
with the repo. Diversity/PSNR/SSIM/MSE need no weights.
"""

from bbdm_tpu.evaluation.diversity import calc_diversity  # noqa: F401
from bbdm_tpu.evaluation.fid import calc_FID, frechet_distance  # noqa: F401
from bbdm_tpu.evaluation.pixel_metrics import calc_psnr_ssim  # noqa: F401
