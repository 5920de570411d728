"""Threaded prefetching batch loader with length-bucketed static shapes.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=cpu_count())``
(reference ``data.py:261,472``). Differences are deliberate TPU design:

* **Static shapes**: batches are padded up to a *bucket boundary* (a multiple
  of ``bucket_quant`` samples) rather than the exact batch max
  (reference ``data.py:368``), bounding the number of distinct shapes XLA
  compiles (FSC utterances land in <10 buckets at 0.5 s quantization).
* **Fixed batch dim**: the trailing partial batch is padded to ``batch_size``
  with zero examples and a per-example weight vector marks real rows, so one
  compiled step serves every batch. Losses/metrics are weight-averaged.
* **Threads, not processes**: decode is NumPy byte work that releases the
  GIL-heavy parts quickly; a thread pool + double-buffered prefetch keeps the
  device fed without fork overhead.
"""

from __future__ import annotations

import concurrent.futures as cf
import threading

import numpy as np


def pad_to_bucket(t: int, quant: int) -> int:
    """Smallest multiple of ``quant`` >= t."""
    return max(quant, ((t + quant - 1) // quant) * quant)


class BatchLoader:
    """Iterable over collated batches of a map-style dataset.

    dataset: object with ``__len__`` and ``__getitem__``.
    collate: list of items -> batch dict (handles padding/bucketing).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        collate,
        shuffle: bool = True,
        seed: int = 0,
        num_threads: int = 8,
        prefetch: int = 2,
        process_index: int | None = None,
        process_count: int | None = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate
        self.shuffle = shuffle
        self.seed = seed
        self.num_threads = num_threads
        self.prefetch = prefetch
        self._epoch = 0
        self._lock = threading.Lock()
        # Multi-host (pod slice): each host reads a disjoint 1/process_count
        # shard of every epoch's example stream over DCN-free local storage.
        # Defaults resolve lazily from jax so single-host tests never touch it.
        self._pidx = process_index
        self._pcount = process_count

    def _process_shard(self):
        if self._pidx is not None and self._pcount is not None:
            return self._pidx, self._pcount
        try:
            import jax

            return jax.process_index(), jax.process_count()
        except Exception:  # pragma: no cover
            return 0, 1

    def __len__(self):
        _, pcount = self._process_shard()
        n = (len(self.dataset) + pcount - 1) // pcount
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        with self._lock:
            epoch = self._epoch
            self._epoch += 1
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            # Same permutation on every host (seeded by epoch), then a
            # disjoint strided shard per host.
            np.random.default_rng(self.seed + epoch).shuffle(order)
        pidx, pcount = self._process_shard()
        dup = np.zeros(len(order), bool)
        if pcount > 1:
            # Equal-length shards: every host must produce the SAME number of
            # batches or lockstep collectives deadlock at epoch end. Wrap the
            # permutation so each host gets exactly ceil(n/pcount) examples
            # (<= pcount-1 wrapped duplicates globally, standard shard+pad).
            # Duplicates are flagged and get weight 0 after collation, so
            # epoch metrics stay exact (the gradient contribution of a
            # weight-0 example is zero too).
            n_shard = -(-len(order) // pcount)
            extra = n_shard * pcount - len(order)
            order = np.concatenate([order, order[:extra]])
            dup = np.concatenate([dup, np.ones(extra, bool)])
            order, dup = order[pidx::pcount], dup[pidx::pcount]
        batches = [
            (order[i : i + self.batch_size].tolist(), dup[i : i + self.batch_size])
            for i in range(0, len(order), self.batch_size)
        ]

        def make_batch(batch_spec):
            idx_list, dup_flags = batch_spec
            items = [self.dataset[i] for i in idx_list]
            batch = self.collate(items)
            if dup_flags.any() and isinstance(batch, dict) and "w" in batch:
                w = np.array(batch["w"], np.float32, copy=True)
                w[: len(dup_flags)] *= 1.0 - dup_flags.astype(np.float32)
                batch = {**batch, "w": w}
            return batch

        with cf.ThreadPoolExecutor(max_workers=self.num_threads) as pool:
            pending = []
            it = iter(batches)
            for _ in range(self.prefetch):
                b = next(it, None)
                if b is not None:
                    pending.append(pool.submit(make_batch, b))
            while pending:
                fut = pending.pop(0)
                b = next(it, None)
                if b is not None:
                    pending.append(pool.submit(make_batch, b))
                yield fut.result()


def device_prefetch(batches, place_fn, depth: int = 2):
    """Overlap host->device batch transfers with compute.

    Yields (real_example_count, placed_batch). ``place_fn`` runs in a worker
    thread so a blocking transfer (slow PCIe, or the dev-relay's ~50 MB/s
    link) overlaps the device step instead of serializing with it.
    """
    import collections

    def place(batch):
        bs = float(batch["w"].sum())  # host-side, before the device copy
        return bs, place_fn(batch)

    with cf.ThreadPoolExecutor(max_workers=1) as pool:
        pending = collections.deque()
        for batch in batches:
            pending.append(pool.submit(place, batch))
            if len(pending) > depth:
                yield pending.popleft().result()
        while pending:
            yield pending.popleft().result()


def pad_wave_batch(waves, batch_size: int, quant: int):
    """Zero-pad variable-length waveforms into a (batch_size, T_bucket) array.

    Returns (x, weights, lengths): weights are 1.0 for real rows, 0.0 for
    batch padding; lengths are true sample counts (0 for padding rows).
    """
    t_max = max(len(w) for w in waves)
    t_pad = pad_to_bucket(t_max, quant)
    x = np.zeros((batch_size, t_pad), np.float32)
    w = np.zeros((batch_size,), np.float32)
    lengths = np.zeros((batch_size,), np.int32)
    for i, wav in enumerate(waves):
        x[i, : len(wav)] = wav
        w[i] = 1.0
        lengths[i] = len(wav)
    return x, w, lengths
