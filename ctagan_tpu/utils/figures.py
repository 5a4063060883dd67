"""Qualitative figure generation (PNG panels) without cv2/matplotlib.

The reference's ``testt()`` (HdTrainer.py:282-426) writes side-by-side
qualitative panels — input windows, target windows, zoomed crops — with
cv2.imwrite. cv2 doesn't exist here, so the framework carries a minimal
grayscale PNG codec (stdlib zlib + struct) and the same panel builder.
"""
from __future__ import annotations

import os
import struct
import zlib
from typing import List, Optional, Sequence

import numpy as np


def write_png_gray(path: str, img: np.ndarray):
    """Write a (H, W) uint8 array as an 8-bit grayscale PNG."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("write_png_gray expects uint8")
    h, w = img.shape
    raw = b"".join(b"\x00" + img[i].tobytes() for i in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # gray, 8-bit
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def read_png_gray(path: str) -> np.ndarray:
    """Read back an 8-bit grayscale PNG written by :func:`write_png_gray`."""
    with open(path, "rb") as f:
        buf = f.read()
    assert buf[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos = 8
    w = h = 0
    idat = b""
    while pos < len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, color = struct.unpack_from(">IIBB", data)
            assert depth == 8 and color == 0
        elif tag == b"IDAT":
            idat += data
        pos += 12 + length
    raw = zlib.decompress(idat)
    img = np.zeros((h, w), np.uint8)
    stride = w + 1
    prev = np.zeros(w, np.uint8)
    for i in range(h):
        row = raw[i * stride : (i + 1) * stride]
        ftype, rowdata = row[0], np.frombuffer(row[1:], np.uint8).copy()
        if ftype == 0:
            out = rowdata
        elif ftype == 2:  # up
            out = (rowdata + prev).astype(np.uint8)
        else:  # other filters unused by our writer
            raise ValueError(f"unsupported PNG filter {ftype}")
        img[i] = out
        prev = img[i]
    return img


def to_uint8(img: np.ndarray) -> np.ndarray:
    """[-1,1] float -> uint8 display range (tensor2image, utils.py:38-47)."""
    return np.clip(127.5 * np.asarray(img, np.float32) + 127.5, 0, 255).astype(
        np.uint8
    )


def _avg_pool2(img: np.ndarray) -> np.ndarray:
    h, w = img.shape[0] // 2 * 2, img.shape[1] // 2 * 2
    x = img[:h, :w].astype(np.float32)
    return ((x[0::2, 0::2] + x[0::2, 1::2] + x[1::2, 0::2] + x[1::2, 1::2]) / 4).astype(
        img.dtype
    )


def make_panel(
    images: Sequence[np.ndarray],
    zoom_center: Optional[tuple] = None,
    zoom_size: int = 128,
) -> np.ndarray:
    """Horizontally stack [-1,1] slices (optionally adding 2x-upscaled crops
    around ``zoom_center``) into one uint8 panel — the testt() layout."""
    panels: List[np.ndarray] = [to_uint8(im) for im in images]
    if zoom_center is not None:
        cy, cx = zoom_center
        half = zoom_size // 2
        for im in images:
            u8 = to_uint8(im)
            crop = u8[
                max(cy - half, 0) : cy + half, max(cx - half, 0) : cx + half
            ]
            up = np.kron(crop, np.ones((2, 2), np.uint8))  # 2x nearest
            pad_h = panels[0].shape[0] - up.shape[0]
            up = np.pad(up, ((0, max(pad_h, 0)), (0, 0)))[: panels[0].shape[0]]
            panels.append(up)
    heights = {p.shape[0] for p in panels}
    target_h = max(heights)
    panels = [
        np.pad(p, ((0, target_h - p.shape[0]), (0, 0))) for p in panels
    ]
    return np.hstack(panels)


def save_qualitative_panel(
    out_dir: str,
    name: str,
    images: Sequence[np.ndarray],
    zoom_center: Optional[tuple] = None,
):
    os.makedirs(out_dir, exist_ok=True)
    panel = make_panel(images, zoom_center)
    write_png_gray(os.path.join(out_dir, f"{name}.png"), panel)
