"""Host-side batching loader with background prefetch.

Replaces the reference's torch DataLoader + DistributedSampler
(`runners/BaseRunner.py:341-379,562-575`): deterministic per-epoch shuffling,
drop_last batching, per-process sharding for multi-host TPU training (each
host loads only its shard — the TPU-native equivalent of DistributedSampler,
SURVEY.md §2.3), and a background thread that decodes/collates the next
batches while the device computes.

Batches are dicts of stacked float32 numpy arrays (NHWC) plus name lists:
    {"x": [B,H,W,C], "x_name": [B], "x_cond": [B,H,W,C], "x_cond_name": [B]}

Dataset contract — THREAD SAFETY: ``num_workers`` defaults to >1, so
``dataset.__getitem__`` is called CONCURRENTLY from a thread pool. A dataset
must therefore be stateless per call or use only per-index state (the shipped
datasets draw any randomness from a per-index ``np.random.RandomState``, e.g.
inpainting masks in `data/custom.py`). A dataset mutating shared state in
``__getitem__`` must be constructed with ``num_workers=0`` (or made
thread-safe); epoch-level mutation belongs in ``set_epoch_seed``, which is
only ever called between epochs from the consumer thread.

IN-RAM DECODE CACHE: ``dataset_config.cache_in_ram: true`` memoizes decoded
fp32 images process-wide (`data/base.py:load_image`), serving repeat epochs
from RAM. The cached arrays are write-protected; ``_collate``'s ``np.stack``
copies them into fresh batch buffers, so consumers never see the cache
aliased. Cost: ~HxWx3x4 bytes per distinct (image, flip) variant.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np


def _collate(items) -> dict:
    xs, x_names, conds, cond_names = [], [], [], []
    for (x, xn), (c, cn) in items:
        xs.append(x)
        x_names.append(xn)
        conds.append(c)
        cond_names.append(cn)
    return {
        "x": np.stack(xs).astype(np.float32),
        "x_name": x_names,
        "x_cond": np.stack(conds).astype(np.float32),
        "x_cond_name": cond_names,
    }


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        drop_last: bool = True,
        seed: int = 0,
        shard_count: int = 1,
        shard_index: int = 0,
        prefetch: int = 2,
        num_workers: int | None = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.shard_count = shard_count
        self.shard_index = shard_index
        self.prefetch = prefetch
        # parallel per-item decode inside the prefetch pass (the reference
        # DataLoader runs num_workers=8 processes, BaseRunner.py:351); threads
        # suffice here because PIL decode and the fastimage ctypes resample
        # both release the GIL. Default: scale to the host, cap at 8.
        if num_workers is None:
            import os

            num_workers = min(8, os.cpu_count() or 1)
        self.num_workers = max(0, int(num_workers))
        self.epoch = 0

    def set_epoch(self, epoch: int):
        """Reshuffle per epoch (reference DistributedSampler.set_epoch,
        `BaseRunner.py:392-393`); also reseeds inpainting masks."""
        self.epoch = int(epoch)
        if hasattr(self.dataset, "set_epoch_seed"):
            self.dataset.set_epoch_seed(self.seed + self.epoch)

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        if self.shard_count > 1:
            # pad to a multiple of shard_count like DistributedSampler
            pad = (-len(idx)) % self.shard_count
            if pad:
                idx = np.concatenate([idx, idx[:pad]])
            idx = idx[self.shard_index :: self.shard_count]
        return idx

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self) -> Iterator[dict]:
        idx = self._indices()
        nb = len(self)
        if self.num_workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in range(nb):
                    chunk = idx[b * self.batch_size : (b + 1) * self.batch_size]
                    # pool.map preserves order -> batch contents deterministic
                    yield _collate(list(pool.map(
                        self.dataset.__getitem__, (int(i) for i in chunk))))
            return
        for b in range(nb):
            chunk = idx[b * self.batch_size : (b + 1) * self.batch_size]
            yield _collate([self.dataset[int(i)] for i in chunk])

    def __iter__(self) -> Iterator[dict]:
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err = []

        def worker():
            try:
                for batch in self._batches():
                    q.put(batch)
            except BaseException as e:  # propagate to consumer
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
