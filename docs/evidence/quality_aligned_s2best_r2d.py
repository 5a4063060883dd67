"""Stage-2 fine-tune from the BEST aligned stage-1 checkpoint (e12,
33.43 dB) instead of the newest (e75, 31.40 dB).

The aligned_aug stage-1 peaks early (33.43 dB at e12, above the 32.64
anchor) then drifts down under adversarial pressure; the reference's
bootstrap convention takes a late fixed epoch (HdTrainer.py:697-699), which
here hands stage 2 a 31.4 dB start. ``stage1_ckpt`` is first-class config,
so this is a supported configuration, not surgery.
"""
import os, sys

from ctagan_tpu.train import build_trainer
from ctagan_tpu.utils.config import load_config

root = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.runs/qal"
lists = {k: os.path.join(root, f"{k}.txt") for k in ("train", "val", "test")}
save2 = os.path.join(root, "save2") + "/"
cfg2 = load_config(dict(
    name="HdGan2", size=512, batchSize=2, compute_dtype="bfloat16",
    val_every=1, save_root=save2,
    image_save=os.path.join(root, "img2") + "/",
    train_list=lists["train"], val_list=lists["val"],
    test_list=lists["test"], n_cpu=4, seed=0, lr=1e-4, lrd=1e-4,
    Adv_lamda=1.0, Corr_lamda=20.0, Smooth_lamda=10.0, noise_level=1,
    ema_decay=0.999, eval_batch=4, fused_body_grad=True, aligned_aug=True,
    n_epochs=23, decay_epoch=3,
    Adv_lamda1=1.0, Corr_lamda1=20.0, Corr_lamda2=2.0,
    stage1_ckpt=os.path.join(root, "save", "HdGan_hd1_e12_33.4318_0.9715.ckpt"),
    resume=os.path.isdir(save2) and any(
        f.startswith("HdGan2_") for f in os.listdir(save2)
    ),
))
tr2 = build_trainer(cfg2)
if not cfg2.resume:
    tr2.bootstrap_from_stage1()
tr2.train()
print("stage2 final validate:", tr2.validate(), flush=True)
print("stage2 test() protocol:", flush=True)
agg = tr2.test(write_dicom=False)
print("TEST_AGG", {k: round(float(v), 4) for k, v in agg.items()}, flush=True)
