"""Round-2 scaled quality run: 2x corpus, longer schedule, chasing the
32.64 dB / 0.939 anchor (BASELINE.md) under the corrected SSIM.

vs quality_detcorpus_r2.py (15 patients x 12 slices -> 60 train slices,
stage-1 60 ep): 24 patients x 15 slices -> 120 train slices from 8
patients, stage-1 75 epochs, stage-2 26. EMA eval shadow on; deterministic
vessel corpus; fused_body_grad ON (custom-VJP Pallas body, gradient
parity locked by tests/test_fused_grad.py — this run doubles as its
training-quality evidence, 84.2 vs 96.7 ms/step).
"""
import os, tempfile

from ctagan_tpu.data.fixtures import make_corpus
from ctagan_tpu.train import build_trainer
from ctagan_tpu.utils.config import load_config

root = tempfile.mkdtemp(prefix="qr2s_corpus_")
print("corpus:", root, flush=True)
lists = make_corpus(root, n_patients=24, slices_per_patient=15, size=512)
base = dict(
    size=512, batchSize=2, compute_dtype="bfloat16", val_every=3,
    save_root=os.path.join(root, "save") + "/",
    image_save=os.path.join(root, "img") + "/",
    train_list=lists["train"], val_list=lists["val"],
    test_list=lists["test"], n_cpu=4, seed=0, lr=1e-4, lrd=1e-4,
    Adv_lamda=1.0, Corr_lamda=20.0, Smooth_lamda=10.0, noise_level=1,
    ema_decay=0.999, eval_batch=4, fused_body_grad=True,
)
cfg1 = load_config(dict(base, name="HdGan", n_epochs=68, decay_epoch=7))
tr1 = build_trainer(cfg1)
tr1.train()
print("stage1 final validate:", tr1.validate(), flush=True)

cfg2 = load_config(dict(
    base, name="HdGan2", n_epochs=23, decay_epoch=3,
    Adv_lamda1=1.0, Corr_lamda1=20.0, Corr_lamda2=2.0,
))
tr2 = build_trainer(cfg2)
tr2.bootstrap_from_stage1()
tr2.train()
print("stage2 final validate:", tr2.validate(), flush=True)
print("stage2 test() protocol:", flush=True)
agg = tr2.test(write_dicom=False)
print("TEST_AGG", {k: round(float(v), 4) for k, v in agg.items()}, flush=True)
