"""test() slowness diagnosis: is the ~20 s wall for 32 slices cold jit
compile (remote compile on the tunnel, paid once per process) or per-slice
work? Times repeated calls in ONE process + isolates the writeback.
"""
import os, tempfile, time

import jax

from ctagan_tpu.data.fixtures import make_corpus
from ctagan_tpu.train import build_trainer
from ctagan_tpu.utils.config import load_config

print("devices:", jax.devices(), flush=True)

root = tempfile.mkdtemp(prefix="evalbench3_")
lists = make_corpus(root, n_patients=6, slices_per_patient=16, size=512)

cfg = load_config(dict(
    name="P2p", size=512, compute_dtype="bfloat16", fused_body=True,
    eval_batch=8, device_windowing=True,
    train_list=lists["train"], val_list=lists["val"],
    test_list=lists["test"],
    save_root=os.path.join(root, "m") + "/",
    image_save=os.path.join(root, "i") + "/",
    n_cpu=4, seed=0,
))
t = build_trainer(cfg, quiet=True)
n = len(t.test_dataset)

for i in range(3):
    t0 = time.perf_counter()
    t.test(write_dicom=True)
    dt = time.perf_counter() - t0
    print(f"test write_dicom=True  call {i}: {n} slices in {dt:.2f}s "
          f"= {n/dt:.1f} sl/s", flush=True)
for i in range(2):
    t0 = time.perf_counter()
    t.test(write_dicom=False)
    dt = time.perf_counter() - t0
    print(f"test write_dicom=False call {i}: {n} slices in {dt:.2f}s "
          f"= {n/dt:.1f} sl/s", flush=True)

nv = len(t.val_dataset)
for i in range(3):
    t0 = time.perf_counter()
    t.validate()
    dt = time.perf_counter() - t0
    print(f"validate call {i}: {nv} slices in {dt:.2f}s = {nv/dt:.1f} sl/s",
          flush=True)
