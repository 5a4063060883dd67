"""Offline 3-D registration stage (host-side pipeline wrapper).

The reference runs ANTs SyN deformable registration of each patient's CTA
series onto the NCCT series, writing warped slices back into the DICOM files
(data_process.py:508-653: ``dcm2nii_sitk`` -> ``ants.registration(SyN)`` ->
``ants.apply_transforms`` -> per-slice writeback with rot90/flip axis fixes).

This environment has no ANTs (or SimpleITK); this module provides:

- the same pipeline orchestration, gated on an importable ``ants`` module —
  on clusters with antspyx installed the original behavior is available
  unchanged;
- a dependency-free fallback, ``register_translation``, implementing 3-D
  rigid translation alignment via phase correlation (FFT) — enough to absorb
  couch shifts between the NCCT and CTA acquisitions, which is the dominant
  misalignment mode the slice-level RegNet cannot fix; the residual
  deformable component is learned online by RegNet during training (the
  RegGAN design point).
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from ctagan_tpu.data.dicom import read_dicom, write_dicom


def _load_series(series_dir: str) -> Tuple[np.ndarray, List[str]]:
    """Stack a series directory into a (N, H, W) HU volume ordered by
    SliceLocation."""
    entries = []
    for f in sorted(os.listdir(series_dir)):
        if not f.startswith("IM"):
            continue
        path = os.path.join(series_dir, f)
        ds = read_dicom(path)
        entries.append((ds.slice_location or 0.0, path, ds))
    entries.sort(key=lambda t: t[0])
    vol = np.stack([e[2].hu_array() for e in entries])
    return vol, [e[1] for e in entries]


def phase_correlation_shift(fixed: np.ndarray, moving: np.ndarray) -> np.ndarray:
    """Integer 3-D shift (dz, dy, dx) aligning ``moving`` to ``fixed`` by
    phase correlation."""
    f = np.fft.fftn(fixed)
    m = np.fft.fftn(moving)
    cross = f * np.conj(m)
    cross /= np.abs(cross) + 1e-8
    corr = np.fft.ifftn(cross).real
    peak = np.unravel_index(np.argmax(corr), corr.shape)
    shift = np.array(peak, np.int64)
    for i, s in enumerate(corr.shape):
        if shift[i] > s // 2:
            shift[i] -= s
    return shift


def register_translation(root: str, patient: str, st: str = "ST0") -> np.ndarray:
    """Align a patient's CTA (SE1) onto the NCCT (SE0) by rigid translation
    and write the warped slices back into the SE1 DICOMs (the reference's
    in-place writeback protocol, data_process.py:626-653). Returns the
    applied (dz, dy, dx) shift."""
    base = os.path.join(root, patient, st)
    fixed, _ = _load_series(os.path.join(base, "SE0"))
    moving, paths = _load_series(os.path.join(base, "SE1"))
    n = min(fixed.shape[0], moving.shape[0])
    shift = phase_correlation_shift(fixed[:n], moving[:n])
    warped = np.roll(moving, tuple(shift), axis=(0, 1, 2))
    for i, path in enumerate(paths):
        ds = read_dicom(path)
        stored = warped[i] - ds.rescale_intercept  # HU -> stored values
        ds.set_pixel_data(np.clip(stored, 0, 4095))
        write_dicom(ds, path)
    return shift


def ants_available() -> bool:
    try:
        import ants  # noqa: F401

        return True
    except ImportError:
        return False


def register_syn(root: str, patient: str, st: str = "ST0"):
    """ANTs SyN deformable registration (reference behavior), available only
    where antspyx is installed."""
    if not ants_available():
        raise ImportError(
            "antspyx not installed; use register_translation for the "
            "dependency-free rigid stage"
        )
    import ants

    base = os.path.join(root, patient, st)
    fixed, _ = _load_series(os.path.join(base, "SE0"))
    moving, paths = _load_series(os.path.join(base, "SE1"))
    fi = ants.from_numpy(fixed.astype(np.float32))
    mi = ants.from_numpy(moving.astype(np.float32))
    tx = ants.registration(fixed=fi, moving=mi, type_of_transform="SyN")
    warped = ants.apply_transforms(
        fixed=fi, moving=mi, transformlist=tx["fwdtransforms"]
    ).numpy()
    for i, path in enumerate(paths):
        ds = read_dicom(path)
        stored = warped[i] - ds.rescale_intercept
        ds.set_pixel_data(np.clip(stored, 0, 4095))
        write_dicom(ds, path)
