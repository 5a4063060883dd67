"""Synthetic-DICOM corpus fixtures.

Builds a miniature hospital-style tree ``root/<patient>/ST0/{SE0,SE1}/IM<i>``
with paired NCCT/CTA slices and the train/val/test list files — the
hermetic stand-in for the reference's CT_CTA corpus (data/data_process.py)
used by tests and examples.
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from ctagan_tpu.data.dicom import generate_uid, make_ct_slice, write_dicom


def synthetic_ct_pixels(
    rng: np.random.Generator, size: int = 64, contrast: bool = False
) -> np.ndarray:
    """A plausible stored-value (0..4095) CT slice: air background, a noisy
    soft-tissue disc, a bone rim, and (for the CTA partner) bright vessels."""
    yy, xx = np.mgrid[:size, :size]
    r = np.hypot(yy - size / 2, xx - size / 2)
    img = np.zeros((size, size), np.float32)
    body = r < size * 0.4
    img[body] = 1024 + 40 + rng.normal(0, 12, body.sum())
    rim = (r >= size * 0.38) & (r < size * 0.4)
    img[rim] = 1024 + 600
    if contrast:
        vy, vx = int(size * 0.5), int(size * 0.42)
        vessel = np.hypot(yy - vy, xx - vx) < size * 0.04
        img[vessel] = 1024 + 350 + rng.normal(0, 10, vessel.sum())
    return np.clip(img, 0, 4095).astype(np.uint16)


def make_corpus(
    root: str,
    n_patients: int = 2,
    slices_per_patient: int = 3,
    size: int = 64,
    seed: int = 0,
    lists: Tuple[str, ...] = ("train", "val", "test"),
) -> dict:
    """Write a paired corpus and list files; returns {list_name: path}."""
    rng = np.random.default_rng(seed)
    all_paths: List[str] = []
    for p in range(n_patients):
        pdir = os.path.join(root, f"patient{p}", "ST0")
        se0 = os.path.join(pdir, "SE0")
        se1 = os.path.join(pdir, "SE1")
        os.makedirs(se0, exist_ok=True)
        os.makedirs(se1, exist_ok=True)
        uid0, uid1 = generate_uid(), generate_uid()
        for s in range(slices_per_patient):
            ncct = synthetic_ct_pixels(rng, size, contrast=False)
            cta = synthetic_ct_pixels(rng, size, contrast=True)
            common = dict(
                patient_id=f"P{p}", accession=f"A{p}", slice_location=float(s) * 5.0
            )
            ds0 = make_ct_slice(
                ncct, series_description="C-", series_uid=uid0, **common
            )
            ds1 = make_ct_slice(
                cta, series_description="C+", series_uid=uid1, **common
            )
            p0 = os.path.join(se0, f"IM{s}")
            p1 = os.path.join(se1, f"IM{s}")
            write_dicom(ds0, p0)
            write_dicom(ds1, p1)
            all_paths.append(p0)

    out = {}
    per = max(1, len(all_paths) // len(lists))
    for i, name in enumerate(lists):
        chunk = all_paths[i * per : (i + 1) * per] or all_paths[:1]
        lp = os.path.join(root, f"{name}.txt")
        with open(lp, "w") as f:
            f.write("\n".join(chunk) + "\n")
        out[name] = lp
    return out
