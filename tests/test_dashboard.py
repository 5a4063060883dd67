"""Live-run dashboard (utils/dashboard.py) — the visdom replacement
(reference trainer/utils.py:50-117): loss/val SVG charts + newest panel in
one self-refreshing HTML file regenerated at epoch/val boundaries."""
import csv
import os

import numpy as np

from ctagan_tpu.utils.dashboard import (
    append_val_csv,
    render_dashboard,
    write_dashboard,
)


def test_render_dashboard_charts_and_table():
    loss_h = ["epoch", "loss_D", "loss_G"]
    loss_r = [[1, 0.9, 2.4], [2, 0.7, 1.9], [3, 0.65, 1.5]]
    val_h = ["epoch", "PSNR", "SSIM"]
    val_r = [[1, 22.0, 0.81], [2, 25.5, 0.88]]
    html_doc = render_dashboard("HdGan", loss_h, loss_r, val_h, val_r)
    # one small-multiple per loss key + one per val metric, never dual-axis
    assert html_doc.count("<figure") == 4
    for label in ("loss_D", "loss_G", "val PSNR", "val SSIM"):
        assert label in html_doc
    assert "<table>" in html_doc  # table view (accessibility pass)
    assert 'http-equiv="refresh"' in html_doc
    assert "<title>epoch 3: 1.5" in html_doc  # hover tooltip on data point
    assert "epoch 3" in html_doc


def test_render_dashboard_embeds_panel_and_handles_empty():
    assert "<figure" not in render_dashboard("X", [], [], [], [])
    png = b"\x89PNG\r\n\x1a\nfakebody"
    doc = render_dashboard("X", [], [], [], [], panel_png=png)
    assert "data:image/png;base64," in doc


def test_write_dashboard_atomic_and_torn_csv(tmp_path):
    d = str(tmp_path)
    with open(os.path.join(d, "P2p_losses.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["epoch", "loss_G"])
        w.writerow([1, 0.5])
        f.write("2,0.4,junk\n")  # torn/malformed tail must be skipped
        f.write("3,oops\n")
    append_val_csv(d, "P2p", 1, 24.0, 0.9)
    out = write_dashboard(d, "P2p")
    assert os.path.basename(out) == "dashboard.html"
    body = open(out).read()
    assert "loss_G" in body and "val PSNR" in body
    assert not os.path.exists(out + ".tmp")


def test_trainer_writes_dashboard_e2e(tmp_path, monkeypatch):
    from ctagan_tpu.data.fixtures import make_corpus
    from ctagan_tpu.train.trainers import P2pTrainer
    from tests.test_trainers import _config

    corpus = make_corpus(
        str(tmp_path / "corpus"), n_patients=1, slices_per_patient=4, size=32
    )
    cfg = _config(tmp_path, corpus, name="P2p", val_every=1)
    t = P2pTrainer(cfg, quiet=True)
    t.train(max_steps_per_epoch=1)
    dash = os.path.join(cfg.save_root, "dashboard.html")
    assert os.path.exists(dash)
    body = open(dash).read()
    assert "<svg" in body
    # the qualitative panel rode along with the validation pass
    assert "data:image/png;base64," in body
    assert os.path.exists(
        os.path.join(cfg.save_root, "P2p_latest_panel.png")
    )
    assert os.path.exists(os.path.join(cfg.save_root, "P2p_val.csv"))
