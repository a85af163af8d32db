"""DiffusionBaseRunner: mid-step diffusion sample dumping
(reference `runners/DiffusionBasedModelRunners/DiffusionBaseRunner.py:13-56`).

Grids every ``save_interval`` steps (plus head/tail windows), optional GIF of
the whole trajectory, final-frame TensorBoard image.
"""

from __future__ import annotations

import os
from abc import ABC

import numpy as np
from PIL import Image

from bbdm_tpu.runners.base import BaseRunner
from bbdm_tpu.utils.images import get_image_grid


class DiffusionBaseRunner(BaseRunner, ABC):
    def save_images(self, all_samples, sample_path, grid_size=4, gif_interval=-1,
                    save_interval=100, head_threshold=10000, tail_threshold=0,
                    writer_tag=None):
        """all_samples: sequence (or stacked [S,B,H,W,C] array) of NHWC batches,
        trajectory order; dumps image_<i>.png / image_out.png / movie.gif."""
        dataset_config = self.config.data.dataset_config
        to_normal = dataset_config.to_normal
        os.makedirs(sample_path, exist_ok=True)
        frames = []
        n = len(all_samples)
        for i in range(n):
            save_png = i % save_interval == 0 or i > head_threshold or i < tail_threshold
            save_gif = gif_interval > 0 and i % gif_interval == 0
            if not (save_png or save_gif):
                continue
            grid = get_image_grid(np.asarray(all_samples[i]), grid_size, to_normal=to_normal)
            im = Image.fromarray(grid)
            if save_gif:
                frames.append(im)
            if save_png:
                im.save(os.path.join(sample_path, f"image_{i}.png"))

        final = get_image_grid(np.asarray(all_samples[-1]), grid_size, to_normal=to_normal)
        Image.fromarray(final).save(os.path.join(sample_path, "image_out.png"))
        if writer_tag is not None and self.is_main_process:
            self.writer.add_image(writer_tag, final, self.global_step, dataformats="HWC")
        if gif_interval > 0 and frames:
            frames[0].save(os.path.join(sample_path, "movie.gif"), save_all=True,
                           append_images=frames[1:], duration=1, loop=0)
