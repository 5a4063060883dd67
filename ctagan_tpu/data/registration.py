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
    SliceLocation, keeping only the LONGEST series in the directory.

    The reference converts each directory with ``dcm2nii_sitk``
    (data_process.py:508-520), which enumerates SeriesInstanceUIDs and
    keeps the one with the most files (``np.argmax(lens)``) — hospital
    exports often mix a scout/localizer series into the same directory.
    Same selection here, grouped by our codec's SeriesInstanceUID.
    """
    entries = []
    for f in sorted(os.listdir(series_dir)):
        if not f.startswith("IM"):
            continue
        path = os.path.join(series_dir, f)
        ds = read_dicom(path)
        uid = ds.series_instance_uid or ""
        entries.append((uid, ds.slice_location or 0.0, path, ds))
    by_uid: dict = {}
    for e in entries:
        by_uid.setdefault(e[0], []).append(e)
    if not by_uid:
        raise FileNotFoundError(f"no IM* DICOM slices in {series_dir}")
    longest = max(by_uid.values(), key=len)
    longest.sort(key=lambda t: t[1])
    vol = np.stack([e[3].hu_array() for e in longest])
    return vol, [e[2] for e in longest]


# ---------------------------------------------------------------------------
# NIfTI-orientation emulation (the reference's axis-fix ledger)
# ---------------------------------------------------------------------------
# The reference round-trips DICOM -> NIfTI (sitk) -> ants -> numpy and then
# repairs the orientation with ``np.rot90(arr, -1)`` + ``np.flip(arr, 1)``
# and a REVERSED z index (``arr[:, :, index - i]`` with i ascending over the
# IM order; data_process.py:603-653). We never leave DICOM pixel space, so
# we emulate that ledger with an exactly-invertible pair: ``dicom_to_nii``
# produces the array ants would see, ``nii_to_dicom`` applies the
# reference's recovery chain. Their composition is the identity — which is
# also the proof that the reference's fix chain undoes sitk's orientation.
# (The absolute sitk orientation constant cancels in the round trip, so it
# does not matter that sitk itself is absent here.)


def dicom_to_nii(vol: np.ndarray) -> np.ndarray:
    """(N, H, W) slice-ordered DICOM volume -> (X, Y, Z) NIfTI-view array
    (inverse of ``nii_to_dicom``)."""
    a = np.transpose(vol[::-1], (1, 2, 0))  # z last, reversed
    a = np.flip(a, axis=1)
    return np.rot90(a, 1)


def nii_to_dicom(nii: np.ndarray) -> np.ndarray:
    """The reference's recovery chain (data_process.py:605-607, 636-642 +
    the invert() flip, :672-711): rot90(-1), flip(axis=1), z reversed."""
    a = np.rot90(nii, -1)
    a = np.flip(a, axis=1)
    return np.transpose(a, (2, 0, 1))[::-1]


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


def _writeback_series(paths: List[str], hu_vol: np.ndarray):
    """In-place per-slice writeback (data_process.py:608-653): HU -> stored
    values via the slice's own rescale intercept, dtype per BitsAllocated
    (int16 / int8; anything else raises, same error as the reference)."""
    for i, path in enumerate(paths):
        ds = read_dicom(path)
        stored = hu_vol[i] - ds.rescale_intercept
        ds.set_pixel_data(np.clip(stored, 0, 4095))
        write_dicom(ds, path)


def register_demons_volumes(
    fixed: np.ndarray, moving: np.ndarray, **kw
) -> np.ndarray:
    """Deformable alignment of ``moving`` onto ``fixed`` with the
    framework's own multi-scale diffeomorphic demons
    (ops/registration3d.py) — the runnable stand-in for the reference's
    ANTs SyN stage (data_process.py:622-624). A rigid phase-correlation
    pre-shift absorbs the couch translation so the demons pyramid only
    carries the residual deformable component. Returns the warped volume
    (same shape/HU scale as ``moving``)."""
    from ctagan_tpu.ops.registration3d import demons_register, warp3d

    n = min(fixed.shape[0], moving.shape[0])
    shift = phase_correlation_shift(fixed[:n], moving[:n])
    rigid = np.roll(moving, tuple(shift), axis=(0, 1, 2)).astype(np.float32)
    phi = demons_register(fixed.astype(np.float32), rigid, **kw)
    return np.asarray(warp3d(rigid, phi))


def align_patient(
    root: str,
    patient: str,
    st: str = "ST0",
    ants_module=None,
    min_slices: int = 5,
    keep_first_unwarped: bool = True,
    method: str = "auto",
):
    """Full per-patient offline alignment — the reference's ``aligement``
    body for one series pair (data_process.py:523-653):

    1. load SE0 (fixed NCCT) / SE1 (moving CTA), longest series in each dir;
    2. skip series with fewer than ``min_slices`` slices (:577-580);
    3. deformable registration: ANTs SyN through the NIfTI-view emulation
       when available (``ants_module`` injects a mock for testing; real
       antspyx used when importable), otherwise the framework's OWN
       diffeomorphic demons registrar (``register_demons_volumes``) — the
       default runnable path is deformable, matching the reference's
       transform class. ``method`` forces one of
       ``auto | syn | demons | translation``;
    4. write SE0 back through the round trip (net identity — the axis-fix
       ledger cancels) and SE1 from the warped volume, with the reference's
       quirk that the NIfTI z=0 slice is written UNWARPED (:634-636,
       ``if (index - i)==0: newimg = m_img[...]``) — kept under
       ``keep_first_unwarped``.

    Returns "syn" / "translation" for the method used, or None if skipped.
    """
    base = os.path.join(root, patient, st)
    se0_dir, se1_dir = os.path.join(base, "SE0"), os.path.join(base, "SE1")
    if len(os.listdir(se0_dir)) < min_slices:
        return None
    fixed, fixed_paths = _load_series(se0_dir)
    moving, paths = _load_series(se1_dir)

    if method not in ("auto", "syn", "demons", "translation"):
        raise ValueError(f"unknown registration method {method!r}")
    ants = ants_module
    if ants is None and method in ("auto", "syn") and ants_available():
        import ants as _ants

        ants = _ants
    if method == "syn" and ants is None:
        raise ImportError("method='syn' requires antspyx (or a mock module)")
    if method in ("demons", "translation"):
        ants = None

    if ants is not None:
        nii_f = dicom_to_nii(fixed.astype(np.float32))
        nii_m = dicom_to_nii(moving.astype(np.float32))
        fi = ants.from_numpy(nii_f)
        mi = ants.from_numpy(nii_m)
        tx = ants.registration(fixed=fi, moving=mi, type_of_transform="SyN")
        wi = ants.apply_transforms(
            fixed=fi, moving=mi, transformlist=tx["fwdtransforms"],
            interpolator="linear",
        )
        # direction/origin/spacing are pinned to the fixed image in the
        # reference (:631-633); the numpy round trip here has no header,
        # so only the voxel grid matters
        warped_nii = wi.numpy() if hasattr(wi, "numpy") else np.asarray(wi)
        if keep_first_unwarped:
            warped_nii = np.array(warped_nii)
            warped_nii[:, :, 0] = nii_m[:, :, 0]
        warped = nii_to_dicom(warped_nii)
        used = "syn"
    elif method == "translation":
        n = min(fixed.shape[0], moving.shape[0])
        shift = phase_correlation_shift(fixed[:n], moving[:n])
        warped = np.roll(moving, tuple(shift), axis=(0, 1, 2))
        used = "translation"
    else:
        warped = register_demons_volumes(
            fixed.astype(np.float32), moving.astype(np.float32)
        )
        if keep_first_unwarped:
            # the reference leaves the NIfTI z=0 slice unwarped (:634-636);
            # in DICOM slice order that is the LAST slice (z reversed)
            warped = np.array(warped)
            warped[-1] = moving[-1]
        used = "demons"

    # SE0 writeback: identity through the ledger — same in-place rewrite
    # the reference performs (:608-625)
    _writeback_series(
        fixed_paths, nii_to_dicom(dicom_to_nii(fixed.astype(np.float32)))
    )
    _writeback_series(paths, warped)
    return used


def register_syn(root: str, patient: str, st: str = "ST0", ants_module=None):
    """ANTs SyN deformable registration (reference behavior). Raises when
    antspyx is not installed and no mock module is injected."""
    if ants_module is None and not ants_available():
        raise ImportError(
            "antspyx not installed; use register_translation for the "
            "dependency-free rigid stage"
        )
    return align_patient(root, patient, st, ants_module=ants_module)


def invert_lists(list_file: str):
    """The reference's ``invert()`` post-pass (data_process.py:672-711):
    horizontally flip (axis=1) every SE0 slice in the list AND its SE1
    partner, rewriting the files in place. Returns processed slice count."""
    with open(list_file) as f:
        paths = [line.strip("\n") for line in f if line.strip()]
    paths.sort()
    paths.sort(key=lambda x: (x.split("IM")[0], int(x.split("IM")[1])))
    n = 0
    for p in paths:
        for q in (p, p.replace("SE0", "SE1")):
            ds = read_dicom(q)
            ds.set_pixel_data(np.flip(ds.pixel_array(), axis=1))
            write_dicom(ds, q)
        n += 1
    return n
