"""bbdm_tpu — a TPU-native (JAX/XLA/Pallas) Brownian Bridge Diffusion framework.

A from-scratch reimplementation of the capabilities of xuekt98/BBDM
(CVPR 2023, arXiv 2205.07680): pixel-space and latent-space Brownian-bridge
diffusion for paired image-to-image translation, with a full training engine
(EMA, gradient accumulation, plateau LR scheduling, checkpointing, TensorBoard
logging), a jit-compiled `lax.scan` skip-step sampler, data parallelism over a
`jax.sharding.Mesh`, and an offline FID/LPIPS/diversity evaluation harness.

The public surface mirrors the reference: the same CLI flags (`main.py`), the
same YAML config templates (`configs/Template-*.yaml`), the same result
directory layout and `sample_to_eval` output contract.
"""

__version__ = "0.1.0"
