"""Aligned_aug + R1 stabilizer A/B: can r1_gamma hold the early stage-1
peak (33.4 dB at e12 in the unstabilized aligned run, drifting to 31.4 by
e75 under adversarial pressure)?

Same corpus/seed/schedule as quality_aligned_r2d.py, r1_gamma=0.1 in BOTH
stages. Usage: python quality_aligned_r1g_r2d.py [corpus_root] [gamma]
"""
import os, sys

from ctagan_tpu.data.fixtures import make_corpus
from ctagan_tpu.train import build_trainer
from ctagan_tpu.utils.config import load_config

root = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.runs/qr1g"
gamma = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1
os.makedirs(root, exist_ok=True)
print("corpus:", root, "r1_gamma:", gamma, flush=True)
if not os.path.exists(os.path.join(root, "train.txt")):
    lists = make_corpus(root, n_patients=24, slices_per_patient=15, size=512)
else:
    lists = {k: os.path.join(root, f"{k}.txt") for k in ("train", "val", "test")}
base = dict(
    size=512, batchSize=2, compute_dtype="bfloat16", val_every=3,
    save_root=os.path.join(root, "save") + "/",
    image_save=os.path.join(root, "img") + "/",
    train_list=lists["train"], val_list=lists["val"],
    test_list=lists["test"], n_cpu=4, seed=0, lr=1e-4, lrd=1e-4,
    Adv_lamda=1.0, Corr_lamda=20.0, Smooth_lamda=10.0, noise_level=1,
    ema_decay=0.999, eval_batch=4, aligned_aug=True, r1_gamma=gamma,
)
has_ckpt = os.path.isdir(os.path.join(root, "save")) and any(
    f.startswith("HdGan_") for f in os.listdir(os.path.join(root, "save"))
)
cfg1 = load_config(dict(base, name="HdGan", n_epochs=68, decay_epoch=7,
                        resume=has_ckpt))
tr1 = build_trainer(cfg1)
tr1.train()
print("stage1 final validate:", tr1.validate(), flush=True)

cfg2 = load_config(dict(
    base, name="HdGan2", n_epochs=23, decay_epoch=3,
    Adv_lamda1=1.0, Corr_lamda1=20.0, Corr_lamda2=2.0,
    resume=os.path.isdir(os.path.join(root, "save")) and any(
        f.startswith("HdGan2_") for f in os.listdir(os.path.join(root, "save"))
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
