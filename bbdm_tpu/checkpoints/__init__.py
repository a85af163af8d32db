"""Checkpointing: msgpack pytree IO with the reference's retention policy,
plus a one-way torch .pth importer."""

from bbdm_tpu.checkpoints.io import load_checkpoint, save_checkpoint  # noqa: F401
