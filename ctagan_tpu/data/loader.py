"""Async host-side data feed: threaded decode + prefetch, device-ready batches.

TPU-native replacement for the reference's ``DataLoaderX`` (DataLoader +
BackgroundGenerator thread prefetch, CycTrainer.py:30-32) and the orphaned
CUDA-stream ``DataPrefetcher`` (HdGan.py:11-47): a pool of decode threads
fills a bounded queue with ready numpy batches so DICOM IO stays off the
training step's critical path; ``jax.device_put`` with a sharding overlaps
the host->device copy with compute (XLA runs transfers async).
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

_SENTINEL = object()


class _DecodeError:
    """Marker carrying a worker-side exception to the consumer thread."""

    def __init__(self, index, error):
        self.index = index
        self.error = error


def _collate(items) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    paths = {}
    for k in items[0]:
        if k.endswith("_path"):
            paths[k] = [it[k] for it in items]
        else:
            out[k] = np.stack([it[k] for it in items])
    out.update(paths)  # type: ignore[arg-type]
    return out


class PrefetchLoader:
    """Iterate a dataset in batches with background decoding.

    Parameters mirror the reference loader's knobs: ``batch_size``,
    ``shuffle`` (reshuffled per epoch from ``rng``), ``drop_last``,
    ``num_threads`` (the ``n_cpu`` analog), ``prefetch`` queue depth.
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        drop_last: bool = False,
        num_threads: int = 4,
        prefetch: int = 8,
        rng: Optional[np.random.Generator] = None,
        shard: Optional[tuple] = None,  # (process_index, process_count)
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch
        self.rng = rng or np.random.default_rng(0)
        self.shard = shard

    def _shard_len(self) -> int:
        n = len(self.dataset)
        if self.shard:
            # truncate to the common length so every process sees the SAME
            # number of items/batches — a ragged split would desync the
            # SPMD step loop across hosts
            n = n // self.shard[1]
        return n

    def _order(self) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        if self.shard:
            # multi-host data sharding: disjoint interleaved subsets,
            # truncated to equal length (shuffle first; split is consistent
            # across hosts only when rng states agree — seed from config.seed)
            idx, count = self.shard
            order = order[idx::count][: self._shard_len()]
        return order

    def __len__(self):
        n = self._shard_len()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._order()
        nb = len(self)
        batches = [
            order[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(nb)
        ]

        # Ordered handoff: worker threads decode items; a collator thread
        # assembles batches in order into a bounded queue.
        item_results: Dict[int, Dict] = {}
        lock = threading.Lock()
        done = threading.Event()
        idx_queue: "queue.Queue" = queue.Queue()
        for bi, idxs in enumerate(batches):
            for j, di in enumerate(idxs):
                idx_queue.put((bi, j, int(di)))

        def worker():
            while not done.is_set():
                try:
                    bi, j, di = idx_queue.get_nowait()
                except queue.Empty:
                    return
                try:
                    item = self.dataset[di]
                except Exception as e:  # surface decode errors, never hang
                    item = _DecodeError(di, e)
                with lock:
                    item_results[(bi, j)] = item  # type: ignore[index]

        out_queue: "queue.Queue" = queue.Queue(maxsize=self.prefetch)

        def collator():
            try:
                for bi, idxs in enumerate(batches):
                    items = []
                    for j in range(len(idxs)):
                        while True:
                            with lock:
                                if (bi, j) in item_results:
                                    items.append(item_results.pop((bi, j)))
                                    break
                            if done.is_set():
                                return
                            threading.Event().wait(0.001)
                    for it in items:
                        if isinstance(it, _DecodeError):
                            batch_out = it
                            break
                    else:
                        batch_out = _collate(items)
                    while True:  # bounded put that honors abandonment
                        try:
                            out_queue.put(batch_out, timeout=0.1)
                            break
                        except queue.Full:
                            if done.is_set():
                                return
            finally:
                while True:
                    try:
                        out_queue.put(_SENTINEL, timeout=0.1)
                        break
                    except queue.Full:
                        if done.is_set():
                            break

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_threads)
        ]
        ct = threading.Thread(target=collator, daemon=True)
        for t in threads:
            t.start()
        ct.start()
        try:
            while True:
                batch = out_queue.get()
                if batch is _SENTINEL:
                    break
                if isinstance(batch, _DecodeError):
                    raise RuntimeError(
                        f"failed to decode dataset item {batch.index}"
                    ) from batch.error
                yield batch
        finally:
            done.set()
