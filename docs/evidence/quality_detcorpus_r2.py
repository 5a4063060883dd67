"""Round-2 quality run on hardware: DETERMINISTIC-geometry corpus (r2
fixtures: parametric vessel trees, shared pair noise) + corrected SSIM.

Stage-1 60 epochs -> stage-2 20 epochs at 512^2 b=2 bf16, 180 slices.
Vs VERDICT r1 #5: (a) post-SSIM-fix val-protocol numbers vs the 32.64 dB /
0.939 anchor, (b) test()-protocol PSNRw should now MOVE with model quality
(vessels are a deterministic function of the NCCT), (c) stage-2 GAN
collapse probe: the main run logs every epoch; if collapse recurs, the
halved-D-lr variant (lrd x0.5, opt-in, no code change) is the A/B.
"""
import os, tempfile

from ctagan_tpu.data.fixtures import make_corpus
from ctagan_tpu.train import build_trainer
from ctagan_tpu.utils.config import load_config

root = tempfile.mkdtemp(prefix="qr2_corpus_")
print("corpus:", root, flush=True)
lists = make_corpus(root, n_patients=15, slices_per_patient=12, size=512)
base = dict(
    size=512, batchSize=2, compute_dtype="bfloat16", val_every=3,
    save_root=os.path.join(root, "save") + "/",
    image_save=os.path.join(root, "img") + "/",
    train_list=lists["train"], val_list=lists["val"],
    test_list=lists["test"], n_cpu=4, seed=0, lr=1e-4, lrd=1e-4,
    Adv_lamda=1.0, Corr_lamda=20.0, Smooth_lamda=10.0, noise_level=1,
    ema_decay=0.999, eval_batch=4,
)
cfg1 = load_config(dict(base, name="HdGan", n_epochs=55, decay_epoch=5))
tr1 = build_trainer(cfg1)
tr1.train()
print("stage1 final validate:", tr1.validate(), flush=True)

cfg2 = load_config(dict(
    base, name="HdGan2", n_epochs=18, decay_epoch=2,
    Adv_lamda1=1.0, Corr_lamda1=20.0, Corr_lamda2=2.0,
))
tr2 = build_trainer(cfg2)
tr2.bootstrap_from_stage1()
tr2.train()
print("stage2 final validate:", tr2.validate(), flush=True)
print("stage2 test() protocol:", flush=True)
agg = tr2.test(write_dicom=False)
print("TEST_AGG", {k: round(float(v), 4) for k, v in agg.items()}, flush=True)
