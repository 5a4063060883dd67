"""List-file datasets: NCCT<->CTA slice pairing and the dual-window family.

Rebuilds the reference's dataset surface (trainer/datasets.py:85-293) without
torch: a dataset yields numpy dicts, and ``ctagan_tpu.data.loader`` turns it
into an async device feed.

Pairing convention (datasets.py:94-97): each list file holds NCCT slice
paths containing ``SE0``; the CTA partner is the same path with ``SE0`` ->
``SE1``.

Two families:
- ``PairedSliceDataset`` — the single-channel family (ImageDataset /
  ValDataset / TestDataset): full-range normalization only
  (``read_dicom`` semantics, datasets.py:74-82).
- ``DualWindowDataset`` — the ``_x`` family (ImageDataset_x & co.): each
  item yields {A1, A2, B1, B2} = (windowed, full-range) for input & target
  (``read_ori_w`` semantics, datasets.py:36-71), and the train split is
  re-oversampled per epoch: ``traind1`` appended once, ``traind2`` appended
  a random 3..5 times (datasets.py:198-211) via :meth:`resample`.

Normalization here is host-side numpy (it must happen before batching);
the same transforms exist as jnp ops in ``ctagan_tpu.ops.windowing`` for
fused on-device use.
"""
from __future__ import annotations

import os
import threading
from typing import Dict, List, Optional, Sequence

import numpy as np

from ctagan_tpu.data.dicom import read_dicom

_WC_DEFAULT = 50.0
_WW_DEFAULT = 400.0


def _resize_nearest_np(img: np.ndarray, size: int) -> np.ndarray:
    """Host-side nearest resize matching torch F.interpolate default — the
    reference's ``Resize`` transform (utils.py:13-32, mode defaulting to
    nearest). Identity when already at size."""
    h, w = img.shape
    if (h, w) == (size, size):
        return img
    ys = np.floor(np.arange(size) * (h / size)).astype(np.int64)
    xs = np.floor(np.arange(size) * (w / size)).astype(np.int64)
    return img[np.ix_(ys, xs)]


def read_fullrange_slice(path: str) -> np.ndarray:
    """Stored pixels -> full-range [-1, 1] (datasets.py:74-82): clamp
    negatives, /4095, center. Uses the native (C++) fused kernel when
    available (ctagan_tpu.data.native), numpy otherwise."""
    from ctagan_tpu.data.native import fullrange_native

    ds = read_dicom(path)
    return fullrange_native(ds.pixel_array())


def read_dual_window_slice(path: str, wc: float = _WC_DEFAULT, ww: float = _WW_DEFAULT):
    """Stored pixels -> (windowed, fullrange), both [-1, 1]
    (``read_ori_w``, datasets.py:36-71). The windowed view is computed on
    HU = stored - 1024 with the fixed clinical window WC=50/WW=400. Fused
    native kernel when available."""
    from ctagan_tpu.data.native import dual_window_native

    ds = read_dicom(path)
    return dual_window_native(ds.pixel_array(), wc, ww)


def _read_list(path: str) -> List[str]:
    with open(path) as f:
        return [line.strip("\n") for line in f if line.strip()]


def _pair(paths: Sequence[str]):
    return [p.replace("SE0", "SE1") for p in paths]


class PairedSliceDataset:
    """Single-channel paired dataset (A = NCCT SE0, B = CTA SE1)."""

    def __init__(
        self,
        list_file: str,
        sort: bool = True,
        unaligned: bool = False,
        size: Optional[int] = None,
        context_slices: int = 1,
        seed: int = 0,
        raw_feed: bool = False,
    ):
        files_a = _read_list(list_file)
        if sort:
            files_a = sorted(files_a)
        self.files_a = files_a
        self.files_b = _pair(files_a)
        self.unaligned = unaligned
        self.size = size
        self.seed = seed
        # raw_feed: yield the STORED uint16 pixels; normalization happens on
        # device (ops/windowing.py, bit-matched) — halves host->device bytes
        self.raw_feed = raw_feed
        # per-index access counters for the unaligned B-draws: each visit to
        # an index gets a fresh but REPRODUCIBLE key (seed, index, count) —
        # deterministic under any loader thread interleaving because the
        # count per index, not the global access order, drives the stream
        self._b_counts: Dict[int, int] = {}
        self._b_lock = threading.Lock()
        # 2.5-D context: the input A becomes ``context_slices`` adjacent
        # slices of the same series stacked on channels (center slice is the
        # prediction target's partner). New capability vs the reference's
        # strictly per-slice pipeline — see BASELINE.json full-volume config.
        if context_slices % 2 != 1:
            raise ValueError("context_slices must be odd")
        self.context_slices = context_slices
        if context_slices > 1:
            self._series_index = {}
            by_series: Dict[str, List[int]] = {}
            for i, p in enumerate(files_a):
                by_series.setdefault(os.path.dirname(p), []).append(i)
            for series, idxs in by_series.items():
                for pos, i in enumerate(idxs):
                    self._series_index[i] = (idxs, pos)

    def __len__(self):
        return len(self.files_a)

    def _load(self, path: str) -> np.ndarray:
        if self.raw_feed:
            img = read_dicom(path).pixel_array()
        else:
            img = read_fullrange_slice(path)
        if self.size:
            img = _resize_nearest_np(img, self.size)
        return img[..., None]

    def _load_context(self, index: int) -> np.ndarray:
        """Stack the +-k neighboring slices (clamped at series edges) of the
        A-side series on the channel axis."""
        idxs, pos = self._series_index[index]
        half = self.context_slices // 2
        chans = []
        for off in range(-half, half + 1):
            j = idxs[min(max(pos + off, 0), len(idxs) - 1)]
            chans.append(self._load(self.files_a[j])[..., 0])
        return np.stack(chans, axis=-1)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        a_path = self.files_a[index % len(self.files_a)]
        if self.unaligned:
            # unpaired sampling for CycleGAN-style training: a fresh random B
            # per access, like the reference's random.randint draw
            # (ImageDataset(unaligned=True), datasets.py:109-111) — but keyed
            # rather than entropy-seeded, so same-seed runs are bit-exact
            # (the reference's per-worker reseeding defeats its own seed).
            # Each epoch's pass bumps the per-index count -> re-randomized
            # every epoch, thread-safe under the loader's decode pool.
            with self._b_lock:
                count = self._b_counts[index] = self._b_counts.get(index, 0) + 1
            rng = np.random.default_rng((self.seed, index, count))
            b_path = self.files_b[int(rng.integers(0, len(self.files_b)))]
        else:
            b_path = self.files_b[index % len(self.files_b)]
        if self.context_slices > 1:
            a_img = self._load_context(index % len(self.files_a))
        else:
            a_img = self._load(a_path)
        item = {"A": a_img, "B": self._load(b_path)}
        item["A_path"] = a_path
        return item


class DualWindowDataset:
    """Dual-window paired dataset ({A1, A2, B1, B2}) with per-epoch
    stochastic oversampling of the hard-example lists."""

    def __init__(
        self,
        list_file: str,
        oversample: bool = False,
        sort: bool = True,
        rng: Optional[np.random.Generator] = None,
        size: Optional[int] = None,
        raw_feed: bool = False,
    ):
        self.list_file = list_file
        self.base = _read_list(list_file)
        self.oversample = oversample
        self.sort = sort
        self.size = size
        # raw_feed: ONE uint16 slice per side instead of four f32 views —
        # the dual-window views are derived on device (ops/windowing.py),
        # cutting the HD feed bytes 6x (2 x u16 vs 4 x f32)
        self.raw_feed = raw_feed
        self.files_a: List[str] = []
        self.files_b: List[str] = []
        self.resample(rng or np.random.default_rng())

    def resample(self, rng: np.random.Generator):
        """Rebuild the (oversampled) file list — the reference rebuilds the
        whole DataLoader every epoch for this (HdTrainer.py:175-182,
        datasets.py:198-211): base + traind1 once + traind2 x randint(3, 6)."""
        files = list(self.base)
        if self.oversample:
            d1 = self.list_file.replace("train", "traind1")
            d2 = self.list_file.replace("train", "traind2")
            if os.path.exists(d1):
                files += _read_list(d1)
            if os.path.exists(d2):
                reps = int(rng.integers(3, 6))
                for _ in range(reps):
                    files += _read_list(d2)
        if self.sort:
            files = sorted(files)
        self.files_a = files
        self.files_b = _pair(files)

    def __len__(self):
        return len(self.files_a)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        a_path = self.files_a[index % len(self.files_a)]
        b_path = self.files_b[index % len(self.files_b)]
        if self.raw_feed:
            a = read_dicom(a_path).pixel_array()
            b = read_dicom(b_path).pixel_array()
            if self.size:
                a = _resize_nearest_np(a, self.size)
                b = _resize_nearest_np(b, self.size)
            return {"A": a[..., None], "B": b[..., None], "A_path": a_path}
        a1, a2 = read_dual_window_slice(a_path)
        b1, b2 = read_dual_window_slice(b_path)
        if self.size:
            a1, a2, b1, b2 = (
                _resize_nearest_np(x, self.size) for x in (a1, a2, b1, b2)
            )
        return {
            "A1": a1[..., None],
            "A2": a2[..., None],
            "B1": b1[..., None],
            "B2": b2[..., None],
            "A_path": a_path,
        }
