"""Host input pipeline: batching, shuffling, prefetch, device placement.

Replaces the reference's torch DataLoader workers (train_pandaset.py:97,
num_workers=2) with a thread-prefetched numpy batcher feeding jitted steps.

TPU-first properties:
  * Fixed shapes always: the final partial batch is padded to batch_size and
    accompanied by a per-sample `sample_mask` (1 real / 0 pad), so the jitted
    step never recompiles and loss/metrics stay exact. (The torch reference
    lets the last batch be ragged — an eager-mode luxury.)
  * Batches are device_put with a NamedSharding on the data axis, so each
    chip receives only its shard (parallel/mesh.py).
  * A background thread overlaps host decode with device compute — on TPU the
    host pipeline must hide entirely behind the step time.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np


class Batcher:
    """Iterates a dataset in shuffled, fixed-shape, padded batches.

    Multi-host sharding (parallel/mesh.py module docstring): pass
    num_shards=jax.process_count(), shard_index=jax.process_index().
    `batch_size` stays the GLOBAL batch size; every process computes the
    same global shuffled order (same seed/epoch) and decodes only its
    contiguous stripe of each global batch — rows
    [shard*B/num_shards : (shard+1)*B/num_shards] — which is exactly the
    block jax.make_array_from_process_local_data expects. sample_index and
    sample_mask are computed globally then sliced, so per-host batches from
    all processes concatenate to the identical single-host batch.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = False,
                 num_shards: int = 1, shard_index: int = 0,
                 decode_workers: int = 0, sample_transform=None):
        if batch_size % num_shards != 0:
            raise ValueError(f"global batch_size {batch_size} not divisible "
                             f"by num_shards {num_shards}")
        if not 0 <= shard_index < num_shards:
            raise ValueError(f"shard_index {shard_index} out of range for "
                             f"{num_shards} shards")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_shards = num_shards
        self.shard_index = shard_index
        # Per-sample decode parallelism (the reference's DataLoader
        # num_workers analog, train_pandaset.py:97). Threads, not processes:
        # the hot decode paths (PIL JPEG, numpy, the native C++ ops) release
        # the GIL, and thread workers avoid pickling batches across
        # processes. 0/1 = decode inline on the producer thread.
        self.decode_workers = decode_workers
        # Optional per-sample post-decode transform (e.g.
        # data/rasterize.py::make_point_sorter for the sorted-input scatter
        # kernel); runs on the decode workers, so it overlaps device compute.
        self.sample_transform = sample_transform
        self._pool = None
        self._epoch = 0

    def _get(self, i):
        s = self.dataset[int(i)]
        return self.sample_transform(s) if self.sample_transform else s

    def _decode(self, indices):
        if self.decode_workers > 1:
            if self._pool is None:
                from concurrent.futures import ThreadPoolExecutor
                self._pool = ThreadPoolExecutor(self.decode_workers)
            return list(self._pool.map(self._get, indices))
        return [self._get(i) for i in indices]

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(
                np.random.SeedSequence([self.seed, self._epoch])).shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._order()
        B = self.batch_size
        L = B // self.num_shards  # local (per-process) batch size
        lo, hi = self.shard_index * L, (self.shard_index + 1) * L
        for start in range(0, len(order), B):
            chunk = order[start:start + B]
            if len(chunk) < B and self.drop_last:
                return
            n_real = len(chunk)
            if n_real < B:  # pad by repeating the first sample
                chunk = np.concatenate([chunk, np.repeat(chunk[:1], B - n_real)])
            mask = np.arange(B) < n_real
            # Decode only this shard's stripe of the global batch.
            local_idx, local_mask = chunk[lo:hi], mask[lo:hi]
            samples = self._decode(local_idx)
            batch: Dict[str, np.ndarray] = {}
            for key in samples[0]:
                if key == "sample_token":
                    continue
                batch[key] = np.stack([s[key] for s in samples])
            batch["sample_index"] = local_idx.astype(np.int32)
            batch["sample_mask"] = local_mask
            batch["segmentation"] = np.where(
                local_mask[:, None, None],
                batch["segmentation"], -1)  # padded samples -> all-ignored
            yield batch


class PrefetchLoader:
    """Wraps a Batcher with a daemon producer thread (depth-2 queue)."""

    def __init__(self, batcher: Batcher, prefetch: int = 2):
        self.batcher = batcher
        self.prefetch = prefetch

    def __len__(self) -> int:
        return len(self.batcher)

    def set_epoch(self, epoch: int) -> None:
        self.batcher.set_epoch(epoch)

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        _END = object()
        stop = threading.Event()

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                for b in self.batcher:
                    if not _put(b):
                        return  # consumer abandoned the epoch
                _put(_END)
            except BaseException as e:  # surface, never silently end epoch
                _put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # Early break / GeneratorExit: release the producer so it does
            # not leak a thread pinning decoded batches.
            stop.set()


def materialize_dataset(dataset, batch_size: int,
                        sample_transform=None) -> Dict[str, np.ndarray]:
    """Stack the whole dataset into fixed-shape arrays, padded to a multiple
    of batch_size, for the on-chip epoch loop (TrainConfig.onchip_epoch).

    Pad rows repeat sample 0 with segmentation=-1 (all-ignored) and
    sample_mask=0 — the same masking contract the Batcher emits, so the
    jitted step math is identical."""
    n = len(dataset)
    n_pad = (n + batch_size - 1) // batch_size * batch_size
    samples = [dataset[i] for i in range(n)]
    if sample_transform is not None:
        samples = [sample_transform(s) for s in samples]
    out: Dict[str, np.ndarray] = {}
    for key in samples[0]:
        if key == "sample_token":
            continue
        arr = np.stack([s[key] for s in samples])
        if n_pad > n:
            arr = np.concatenate([arr, np.repeat(arr[:1], n_pad - n, axis=0)])
        out[key] = arr
    out["sample_index"] = np.concatenate(
        [np.arange(n, dtype=np.int32),
         np.zeros(n_pad - n, np.int32)])
    out["sample_mask"] = np.arange(n_pad) < n
    out["segmentation"] = np.where(out["sample_mask"][:, None, None],
                                   out["segmentation"], -1)
    return out


def make_loader(dataset, batch_size: int, shuffle: bool, seed: int = 0,
                drop_last: bool = False, prefetch: int = 2,
                num_shards: Optional[int] = None,
                shard_index: Optional[int] = None,
                decode_workers: int = 0,
                sample_transform=None) -> PrefetchLoader:
    """Build the prefetching loader. num_shards/shard_index default to
    jax.process_count()/jax.process_index() so multi-host runs shard the
    input pipeline automatically (single-process: 1/0, a no-op)."""
    if num_shards is None or shard_index is None:
        import jax
        num_shards = jax.process_count() if num_shards is None else num_shards
        shard_index = jax.process_index() if shard_index is None else shard_index
    return PrefetchLoader(Batcher(dataset, batch_size, shuffle, seed,
                                  drop_last, num_shards=num_shards,
                                  shard_index=shard_index,
                                  decode_workers=decode_workers,
                                  sample_transform=sample_transform),
                          prefetch)
