"""PNG codec + qualitative panel tests."""
import os

import numpy as np

from ctagan_tpu.utils.figures import (
    make_panel,
    read_png_gray,
    save_qualitative_panel,
    to_uint8,
    write_png_gray,
)


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    p = tmp_path / "t.png"
    write_png_gray(str(p), img)
    back = read_png_gray(str(p))
    np.testing.assert_array_equal(back, img)


def test_to_uint8_range():
    img = np.array([[-1.0, 0.0, 1.0]])
    np.testing.assert_array_equal(to_uint8(img), [[0, 127, 255]])


def test_panel_stacks_and_zooms(tmp_path):
    rng = np.random.default_rng(1)
    ims = [rng.uniform(-1, 1, (64, 64)).astype(np.float32) for _ in range(3)]
    panel = make_panel(ims)
    assert panel.shape == (64, 64 * 3)
    panel_z = make_panel(ims, zoom_center=(32, 32), zoom_size=16)
    assert panel_z.shape[1] == 64 * 3 + 32 * 3  # 3 imgs + 3 2x-zoomed crops
    save_qualitative_panel(str(tmp_path), "panel", ims, zoom_center=(32, 32))
    assert os.path.exists(tmp_path / "panel.png")
