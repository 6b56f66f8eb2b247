"""Prefetching device loader.

Capability parity: the reference's multi-process ``DataLoader`` +
``DistributedSampler`` (train.py:143-150) — replaced TPU-style by a
background thread that assembles packed host batches (one fancy-index
gather each, see dataset.py) and ``device_put``s them ahead of compute,
double-buffering so the TPU never waits on the host. Per-host sharding
(``shard_index`` / ``num_shards``) replaces DistributedSampler on
multi-host meshes; on a single-process mesh the batch is laid out across
the data axis with a NamedSharding.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax

from inferbiomechanics_tpu.data.dataset import Batch, WindowDataset


class PrefetchLoader:
    """Iterate device-resident batches with background host assembly."""

    def __init__(self,
                 dataset: WindowDataset,
                 batch_size: int,
                 *,
                 shuffle: bool = True,
                 drop_last: bool = True,
                 prefetch: int = 2,
                 sharding=None,
                 shard_index: int = 0,
                 num_shards: int = 1,
                 n_threads: Optional[int] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.sharding = sharding
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.n_threads = n_threads

    def __len__(self) -> int:
        n = len(self.dataset) // self.num_shards
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, seed: int = 0) -> Iterator[Batch]:
        """Yield one epoch of device-resident batches."""
        q: 'queue.Queue' = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for host_batch in self.dataset.batches(
                        self.batch_size, shuffle=self.shuffle,
                        drop_last=self.drop_last, seed=seed,
                        shard_index=self.shard_index, num_shards=self.num_shards,
                        n_threads=self.n_threads):
                    if stop.is_set():
                        return
                    if self.sharding is not None and jax.process_count() > 1:
                        # multi-host: this process holds its LOCAL shard of
                        # the global batch (device_put cannot address other
                        # hosts' devices)
                        inputs = jax.make_array_from_process_local_data(
                            self.sharding, host_batch.inputs)
                        labels = jax.make_array_from_process_local_data(
                            self.sharding, host_batch.labels)
                    elif self.sharding is not None:
                        inputs = jax.device_put(host_batch.inputs, self.sharding)
                        labels = jax.device_put(host_batch.labels, self.sharding)
                    else:
                        inputs = jax.device_put(host_batch.inputs)
                        labels = jax.device_put(host_batch.labels)
                    q.put(Batch(inputs=inputs, labels=labels,
                                subject_indices=host_batch.subject_indices,
                                trial_indices=host_batch.trial_indices))
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=5.0)
