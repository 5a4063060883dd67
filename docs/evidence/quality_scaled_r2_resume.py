"""Resume of quality_scaled_r2.py after a tunnel wedge at stage-1 e47
(futex wait, no log growth 18 min — the r1c wedge signature; CLAUDE.md
playbook: kill + resume from the newest checkpoint). Same corpus and
save_root; stage-1 resumes via config resume=True.
"""
import os, sys

from ctagan_tpu.data.fixtures import make_corpus  # noqa: F401 (same corpus reused)
from ctagan_tpu.train import build_trainer
from ctagan_tpu.utils.config import load_config

root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/qr2s_corpus_f6iwvft5"
print("corpus:", root, flush=True)
lists = {k: os.path.join(root, f"{k}.txt") for k in ("train", "val", "test")}
base = dict(
    size=512, batchSize=2, compute_dtype="bfloat16", val_every=3,
    save_root=os.path.join(root, "save") + "/",
    image_save=os.path.join(root, "img") + "/",
    train_list=lists["train"], val_list=lists["val"],
    test_list=lists["test"], n_cpu=4, seed=0, lr=1e-4, lrd=1e-4,
    Adv_lamda=1.0, Corr_lamda=20.0, Smooth_lamda=10.0, noise_level=1,
    ema_decay=0.999, eval_batch=4, fused_body_grad=True,
)
cfg1 = load_config(dict(base, name="HdGan", n_epochs=68, decay_epoch=7,
                        resume=True))
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
