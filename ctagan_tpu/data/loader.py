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
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch
        self.rng = rng or np.random.default_rng(0)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self.rng.shuffle(order)
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
                item = self.dataset[di]
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
                    out_queue.put(_collate(items))
            finally:
                out_queue.put(_SENTINEL)

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
                yield batch
        finally:
            done.set()
