"""Whole-series inference service: SE0 DICOM series -> synthetic SE2 series.

The production serving path: load a patient's full NCCT series, synthesize
the CTA volume in sharded batches on the mesh (ctagan_tpu.parallel.volume),
and emit a complete DICOM series under a fresh SeriesInstanceUID — the
batch/volume counterpart of the reference's slice-by-slice test() writeback.
"""
from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ctagan_tpu.data.dicom import generate_uid, read_dicom, write_dicom
from ctagan_tpu.data.native import dual_window_native, resize_nearest_native
from ctagan_tpu.parallel.volume import infer_volume


def load_series_fullrange(series_dir: str, size: Optional[int] = None):
    """Load an SE0 series into a (N, H, W) full-range [-1,1] volume ordered
    by SliceLocation; returns (volume, slice_paths)."""
    entries = []
    for f in sorted(os.listdir(series_dir)):
        if not f.startswith("IM"):
            continue
        path = os.path.join(series_dir, f)
        ds = read_dicom(path)
        entries.append((ds.slice_location or 0.0, path, ds))
    entries.sort(key=lambda t: t[0])
    slices = []
    for _, _, ds in entries:
        _, full = dual_window_native(ds.pixel_array())
        if size:
            full = resize_nearest_native(full, size)
        slices.append(full)
    return np.stack(slices), [e[1] for e in entries]


def infer_series(trainer, series_dir: str, out_root: str) -> str:
    """Run the trainer's generator over a whole SE0 series and write the
    synthetic SE2 series; returns the output directory."""
    from ctagan_tpu.utils.checkpoint import find_latest_checkpoint

    cfg = trainer.config
    if cfg.generator_ckpt:
        trainer.load_generator(cfg.generator_ckpt)
    else:
        found = find_latest_checkpoint(cfg.save_root, trainer.ckpt_prefix)
        if found:
            trainer.load_generator(found[0])

    volume, paths = load_series_fullrange(series_dir, size=cfg.size)
    g_model = getattr(trainer, "g_eval", trainer.g_model)
    params = trainer._g_params()

    if getattr(trainer, "family", "") == "p3d":
        from ctagan_tpu.parallel.volume import infer_volume_3d

        if getattr(cfg, "infer_depth_sharded", False):
            # EXACT whole-series inference: depth axis sharded over (a
            # submesh of) the device mesh with halo exchange — no Hann
            # blending. Submesh sized so each slab covers the depth
            # receptive field; n=1 degenerates to the exact unsharded
            # whole-volume forward.
            from ctagan_tpu.parallel.mesh import make_mesh
            from ctagan_tpu.parallel.volume import infer_volume_depth_sharded

            import jax

            halo = 6 + 2 * int(getattr(g_model, "n_residual_blocks", 6))
            n = min(len(jax.devices()), max(1, volume.shape[0] // halo))
            while n > 1 and volume.shape[0] % n:
                n -= 1
            try:
                fake = infer_volume_depth_sharded(
                    g_model, params, volume, mesh=make_mesh(n=n), halo=halo
                )
            except ValueError as e:  # e.g. depth_downsample model variants
                print(f"infer_depth_sharded unavailable ({e}); "
                      "falling back to Hann depth windows")
                fake = infer_volume_3d(
                    lambda p, x: g_model.apply(p, x), params, volume,
                    depth=cfg.patch_depth,
                )
        else:
            fake = infer_volume_3d(
                lambda p, x: g_model.apply(p, x),
                params,
                volume,
                depth=cfg.patch_depth,
            )
    elif (ctx := int(getattr(cfg, "context_slices", 1))) > 1:
        # 2.5-D models: stack +-k neighboring slices on channels (edge clamp)
        half = ctx // 2
        n = volume.shape[0]
        idx = [np.clip(np.arange(n) + off, 0, n - 1) for off in range(-half, half + 1)]
        stacked = np.stack([volume[i] for i in idx], axis=-1)
        fake = infer_volume(
            lambda p, x: g_model.apply(p, x), params, stacked, mesh=trainer.mesh
        )
    else:
        fake = infer_volume(
            lambda p, x: g_model.apply(p, x), params, volume, mesh=trainer.mesh
        )

    out_dir = os.path.join(out_root, "volume", "SE2")
    os.makedirs(out_dir, exist_ok=True)
    uid = generate_uid()
    for i, path in enumerate(paths):
        ds = read_dicom(path)
        img = fake[i]
        if img.shape != (ds.rows, ds.cols):
            img = resize_nearest_native(
                np.ascontiguousarray(img, np.float32), ds.rows
            )
        ds.set_pixel_data((img + 1.0) * 0.5 * 4095.0)
        ds.series_instance_uid = uid
        write_dicom(ds, os.path.join(out_dir, os.path.basename(path)))
    return out_dir
