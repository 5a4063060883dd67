"""Stage-2 fine-tune of the r4 aligned arm (multi-scale D + masked SR_loss2),
bootstrapped from the BEST aligned stage-1 checkpoint (33.95 dB, e6).
Same corpus as both r4 arms (432 slices, .runs/qexact_r4)."""
import os
import re
import sys

from ctagan_tpu.train import build_trainer
from ctagan_tpu.utils.config import load_config

root = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.runs/qexact_r4"
lists = {k: os.path.join(root, f"{k}.txt") for k in ("train", "val", "test")}
save1 = os.path.join(root, "save_aligned")
stamp = re.compile(r"HdGan_hd1_e(\d+)_([0-9.]+)_([0-9.]+)\.ckpt$")
best = max(
    (
        (float(m.group(2)), os.path.join(save1, f))
        for f in os.listdir(save1)
        if (m := stamp.match(f))
    ),
)
print("best aligned stage-1 checkpoint:", best, flush=True)

save2 = os.path.join(root, "save_aligned2") + "/"
cfg = load_config(dict(
    name="HdGan2", size=512, batchSize=2, compute_dtype="bfloat16",
    n_epochs=18, decay_epoch=4, val_every=2,
    save_root=save2, image_save=os.path.join(root, "img_aligned2") + "/",
    train_list=lists["train"], val_list=lists["val"],
    test_list=lists["test"], n_cpu=4, seed=0, lr=1e-4, lrd=1e-4,
    Adv_lamda1=1.0, Corr_lamda1=20.0, Corr_lamda2=2.0,
    Smooth_lamda=10.0, noise_level=1, ema_decay=0.999, eval_batch=4,
    stall_timeout=900.0, aligned_aug=True, stage1_ckpt=best[1],
    resume=os.path.isdir(save2) and any(
        f.startswith("HdGan2_") for f in os.listdir(save2)
    ),
))
tr = build_trainer(cfg)
if not cfg.resume:
    tr.bootstrap_from_stage1()
tr.train()
print("aligned stage2 final validate:", tr.validate(), flush=True)
print("aligned stage2 test() protocol:", flush=True)
agg = tr.test(write_dicom=False)
print("TEST_AGG", {k: round(float(v), 4) for k, v in agg.items()}, flush=True)
