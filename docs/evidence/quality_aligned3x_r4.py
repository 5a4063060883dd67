"""Round-4 paired A/B: aligned_aug on the SAME 3x corpus as the exact run.

quality_exact_r3.py (run as qexact_r4) holds training semantics exactly at
the reference's (independent A/B affine draws, HdTrainer.py:131-142) on a
pre-registered 432-slice corpus: stage-1 plateau 27.0-27.5 dB, stage-2
best ~30.1 — the 3.6x corpus left the ceiling where the r3 noise-floor
analysis put it (the affine label noise, not data volume, binds).

This script is the other arm: IDENTICAL corpus, schedule, seed — one flag
flipped (`aligned_aug: true`, one affine draw per pair). r2d's 120-slice
aligned run peaked 33.43 dB at e12; this reuses the qexact_r4 corpus for
a clean paired comparison against both the exact arm and the 32.64/0.939
reference checkpoint anchor (BASELINE.md). Stage 1 only, capped at the
early-peak region (aligned runs peak by ~e12 then drift under adversarial
pressure; best-epoch checkpoints keep the peak).
"""
import os
import sys

from ctagan_tpu.train import build_trainer
from ctagan_tpu.utils.config import load_config

root = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.runs/qexact_r4"
lists = {k: os.path.join(root, f"{k}.txt") for k in ("train", "val", "test")}
for p in lists.values():
    assert os.path.exists(p), f"corpus list missing: {p} (run the exact arm first)"

save = os.path.join(root, "save_aligned") + "/"
cfg = load_config(dict(
    name="HdGan", size=512, batchSize=2, compute_dtype="bfloat16",
    n_epochs=18, decay_epoch=4, val_every=2,
    save_root=save, image_save=os.path.join(root, "img_aligned") + "/",
    train_list=lists["train"], val_list=lists["val"],
    test_list=lists["test"], n_cpu=4, seed=0, lr=1e-4, lrd=1e-4,
    Adv_lamda=1.0, Corr_lamda=20.0, Smooth_lamda=10.0, noise_level=1,
    ema_decay=0.999, eval_batch=4, stall_timeout=900.0,
    aligned_aug=True,
    resume=os.path.isdir(save) and any(
        f.startswith("HdGan_") for f in os.listdir(save)
    ),
))
tr = build_trainer(cfg)
tr.train()
print("aligned stage1 final validate:", tr.validate(), flush=True)
