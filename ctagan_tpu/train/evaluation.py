"""Test-time evaluation + synthetic-CTA DICOM emission.

Reimplements the reference's ``test()`` surface (HdTrainer.py:428-564,
CycTrainer.py:238-360): iterate the test list, synthesize fake CTA, score it
against the real CTA twice — in per-file "best window" display space
(``to_windowdata`` with the SE1 header's WC/WW, 0.3 body masks) and in raw
[-1,1] space with the same masks — then write the synthetic slices back
into a DICOM tree ``image_save/ST0/<i>/{SE0,SE1}`` (copies of the originals)
and ``image_save/ST1/<i>/SE2`` (the synthetic series under a fresh
SeriesInstanceUID).

Metric set: masked MAE / PSNR / SSIM / UQI, plus LPIPS when a weights file
is available (ops.lpips); aggregates are printed for both spaces — the same
10 numbers the reference prints (HdTrainer.py:553-564).
"""
from __future__ import annotations

import os
import shutil
from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ctagan_tpu.data.dicom import generate_uid, read_dicom, write_dicom
from ctagan_tpu.ops.metrics import masked_mae, masked_psnr, ssim, uqi
from ctagan_tpu.ops.windowing import body_mask, mask_background_to_air, to_windowdata


def _threshold_mask(img, thr=0.3):
    return body_mask(img, thr)


def _masked_views(fake_b, real_b, wc, ww):
    """The reference's masking protocol (HdTrainer.py:481-538), shared by
    every evaluator: windowed real -> mask ``bb``; windowed fake masked by
    ``bb`` then its own mask ``cc``; raw pair masked by bb/cc; masked-out
    pixels become -1. Returns (c_m, b_m, fake_m, real_m)."""
    b = to_windowdata(real_b, wc, ww)
    bb = _threshold_mask(b)
    b_m = mask_background_to_air(b, bb)

    c = to_windowdata(fake_b, wc, ww) * bb
    cc = _threshold_mask(c)
    c_m = mask_background_to_air(c, cc)

    fake_m = mask_background_to_air(fake_b, cc)
    real_m = mask_background_to_air(real_b, bb)
    return c_m, b_m, fake_m, real_m


def _metric_suite(fake_b, real_b, wc, ww):
    """All 8 window+raw metrics as ONE traced computation — a single device
    round-trip per slice instead of 8-10 (the per-call tunnel latency would
    otherwise dominate eval wall-clock; see CLAUDE.md perf notes)."""
    c_m, b_m, fake_m, real_m = _masked_views(fake_b, real_b, wc, ww)
    return {
        "MAEw": masked_mae(c_m, b_m),
        "PSNRw": masked_psnr(c_m, b_m),
        "SSIMw": ssim(c_m, b_m),
        "UQIw": uqi(c_m, b_m),
        "MAE": masked_mae(fake_m, real_m),
        "PSNR": masked_psnr(fake_m, real_m),
        "SSIM": ssim(fake_m, real_m),
        "UQI": uqi(fake_m, real_m),
    }


_metric_suite_jit = None


def evaluate_pair(
    fake_b: np.ndarray,
    real_b: np.ndarray,
    wc: float,
    ww: float,
    lpips_fn: Optional[Callable] = None,
) -> Dict[str, float]:
    """Score one (fake, real) full-range slice pair in window + raw space.

    Masking protocol (HdTrainer.py:481-538): the *windowed real* thresholded
    at 0.3 gives mask ``bb``; the windowed fake is masked by ``bb`` then by
    its own 0.3 mask ``cc``; raw real uses ``bb``, raw fake uses ``cc``;
    masked-out pixels become -1 (air). The whole suite runs as one jitted
    call; WC/WW are traced scalars so per-file windows don't recompile.
    """
    import jax

    global _metric_suite_jit
    if _metric_suite_jit is None:
        _metric_suite_jit = jax.jit(_metric_suite)

    vals = _metric_suite_jit(
        jnp.asarray(fake_b),
        jnp.asarray(real_b),
        jnp.float32(wc),
        jnp.float32(ww),
    )
    vals = jax.device_get(vals)
    out = {k: float(v) for k, v in vals.items()}
    if lpips_fn is not None:
        c_m, b_m, fake_m, real_m = _masked_views(
            jnp.asarray(fake_b), jnp.asarray(real_b), wc, ww
        )
        out["LPIPSw"] = float(lpips_fn(c_m, b_m))
        out["LPIPS"] = float(lpips_fn(fake_m, real_m))
    return out


class DicomWriteback:
    """Stateful SE2 emitter reproducing the reference's per-patient layout:
    a new patient directory index ``ii`` and SeriesInstanceUID start whenever
    the source series path changes (HdTrainer.py:456-476)."""

    def __init__(self, image_save_root: str):
        self.root = image_save_root
        self.current_series = None
        self.patient_idx = 0
        self.series_uid = None
        self.out0 = self.out1 = self.out2 = None

    def write(self, a_path: str, fake_b: np.ndarray):
        series_dir = a_path.split("IM")[0]
        if series_dir != self.current_series:
            self.current_series = series_dir
            self.patient_idx += 1
            self.series_uid = generate_uid()
            self.out0 = os.path.join(
                self.root, "ST0", str(self.patient_idx), "SE0"
            )
            self.out1 = os.path.join(
                self.root, "ST0", str(self.patient_idx), "SE1"
            )
            self.out2 = os.path.join(
                self.root, "ST1", str(self.patient_idx), "SE2"
            )
            for d in (self.out0, self.out1, self.out2):
                os.makedirs(d, exist_ok=True)

        name = a_path.split("SE0/")[-1] if "SE0/" in a_path else os.path.basename(a_path)
        b_path = a_path.replace("SE0", "SE1")
        ds = read_dicom(b_path)
        fake_b = np.asarray(fake_b)
        if np.issubdtype(fake_b.dtype, np.integer):
            # already de-normalized to stored values ON DEVICE
            # (trainers._test_step) — same (x+1)*0.5*4095 f32 arithmetic
            # and truncating int cast as below
            newimg = fake_b
        else:
            # de-normalize [-1,1] -> stored values (HdTrainer.py:539)
            newimg = (fake_b + 1.0) * 0.5 * 4095.0
        ds.set_pixel_data(newimg)
        ds.series_instance_uid = self.series_uid
        shutil.copy(a_path, os.path.join(self.out0, name))
        shutil.copy(b_path, os.path.join(self.out1, name))
        write_dicom(ds, os.path.join(self.out2, name))


def aggregate(metric_rows) -> Dict[str, float]:
    if not metric_rows:
        return {}
    keys = metric_rows[0].keys()
    return {k: float(np.mean([r[k] for r in metric_rows])) for k in keys}
