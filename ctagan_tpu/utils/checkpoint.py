"""Checkpointing: metric-stamped, resumable, dependency-light.

The reference saves one ``torch.save(state_dict)`` per network per epoch
with filenames embedding epoch + val PSNR/SSIM every 5th epoch
(CycTrainer.py:221-236) and resumes only by hand-editing code. Here a
checkpoint is a single msgpack file (flax.serialization) holding every
network's params, optimizer states, epoch, lr and val metrics — with the
same metric-stamped naming scheme plus a first-class "find newest and
resume" path.
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Optional, Tuple

from flax import serialization

_CKPT_RE = re.compile(r"^(?P<prefix>.+?)_e(?P<epoch>\d+)(?:_(?P<metrics>[-\d._]+))?\.ckpt$")


def checkpoint_name(
    prefix: str, epoch: int, psnr: Optional[float] = None, ssim: Optional[float] = None
) -> str:
    """``<prefix>_e<epoch>[_<psnr>_<ssim>].ckpt`` — the reference's
    metric-stamped naming (e.g. ``netG_A2B_45_32.6358_0.939.pth``)."""
    if psnr is not None and ssim is not None:
        return f"{prefix}_e{epoch}_{round(psnr, 4)}_{round(ssim, 4)}.ckpt"
    return f"{prefix}_e{epoch}.ckpt"


def save_checkpoint(
    save_root: str,
    prefix: str,
    epoch: int,
    state: Any,
    psnr: Optional[float] = None,
    ssim: Optional[float] = None,
) -> str:
    os.makedirs(save_root, exist_ok=True)
    path = os.path.join(save_root, checkpoint_name(prefix, epoch, psnr, ssim))
    # atomic: a stall-kill (watchdog os._exit, OOM-kill, power loss) landing
    # mid-write must never leave a truncated file at the final name — the
    # supervisor resumes from the newest checkpoint, so a torn write there
    # would wedge every retry (observed in the wedge-drill test)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(state))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, target: Any) -> Any:
    """Restore into a pytree of the same structure (``target`` provides the
    treedef and shapes/dtypes)."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(target, data)


def find_checkpoints(save_root: str, prefix: str) -> List[Tuple[str, int]]:
    """All checkpoints for a prefix, newest epoch first; (path, epoch) pairs.
    Recognizes both msgpack files and orbax directories (``.ocp`` suffix)."""
    if not os.path.isdir(save_root):
        return []
    out: List[Tuple[str, int]] = []
    for fn in os.listdir(save_root):
        name = fn[:-4] + ".ckpt" if fn.endswith(".ocp") else fn
        m = _CKPT_RE.match(name)
        if m and m.group("prefix") == prefix:
            out.append((os.path.join(save_root, fn), int(m.group("epoch"))))
    out.sort(key=lambda pe: pe[1], reverse=True)
    return out


def find_latest_checkpoint(
    save_root: str, prefix: str
) -> Optional[Tuple[str, int]]:
    """Newest checkpoint (by epoch) for a prefix; returns (path, epoch)."""
    found = find_checkpoints(save_root, prefix)
    return found[0] if found else None


# ---------------------------------------------------------------------------
# Orbax backend (async-capable; SURVEY.md §5 "Orbax-style checkpointing")
# ---------------------------------------------------------------------------

_orbax_ckptr = None


def _get_orbax(async_save: bool = True):
    global _orbax_ckptr
    if _orbax_ckptr is None:
        import orbax.checkpoint as ocp

        _orbax_ckptr = (
            ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
            if async_save
            else ocp.StandardCheckpointer()
        )
    return _orbax_ckptr


def save_checkpoint_orbax(
    save_root: str,
    prefix: str,
    epoch: int,
    state: Any,
    psnr: Optional[float] = None,
    ssim: Optional[float] = None,
) -> str:
    """Non-blocking (async) orbax save: training proceeds while the previous
    checkpoint flushes to disk — the reference blocks on torch.save each
    epoch."""
    os.makedirs(save_root, exist_ok=True)
    name = checkpoint_name(prefix, epoch, psnr, ssim)[: -len(".ckpt")] + ".ocp"
    path = os.path.abspath(os.path.join(save_root, name))
    import shutil

    ckptr = _get_orbax()
    # a pending async save to the same path could commit between our
    # exists-check and save (or be deleted mid-flight by the rmtree) —
    # drain first so same-name re-saves are race-free
    ckptr.wait_until_finished()
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr.save(path, state)
    return path


def load_checkpoint_orbax(path: str, target: Any) -> Any:
    ckptr = _get_orbax()
    ckptr.wait_until_finished()
    return ckptr.restore(os.path.abspath(path), target)


def wait_for_checkpoints():
    """Block until pending async orbax saves are durable (call at exit)."""
    if _orbax_ckptr is not None:
        _orbax_ckptr.wait_until_finished()
