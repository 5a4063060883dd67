"""r2 hardware A/Bs, run serialized after bench_reconcile_r2:

(1) saturated inference: bf16 fused chain vs int8 fused body (ops/fused_s8)
    at b=32 and b=64 — VERDICT r1 #9 (target: >= ~300 sl/s or a documented
    negative);
(2) eval throughput: pipelined validate()/test() wall-clock on a 96-slice
    corpus at 512² vs the r1 ~30 sl/s synced floor — VERDICT r1 #4
    (target: >= 5x).
"""
import os, tempfile, time
import numpy as np
import jax, jax.numpy as jnp

from ctagan_tpu.models import Generator
from ctagan_tpu.ops.quantize import quantize_generator, generator_int8_forward

print("devices:", jax.devices(), flush=True)

params = Generator(1, 1).init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 1)))

def bench_fwd(tag, fwd, p, batch, iters=20):
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (batch, 512, 512, 1)).astype(np.float32))
    float(fwd(p, x)[0, 0, 0, 0]); float(fwd(p, x)[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(p, x)
    float(out[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag} b={batch}: {dt*1e3:.1f} ms = {batch/dt:.1f} sl/s", flush=True)
    return batch / dt

# (1) bf16 fused chain vs int8 fused body
bf16 = Generator(1, 1, dtype=jnp.bfloat16, fused_body=True)
fwd_bf16 = jax.jit(lambda p, x: bf16.apply(p, x))
qp = quantize_generator(params)
fwd_s8 = jax.jit(generator_int8_forward)
for b in (32, 64):
    bench_fwd("bf16 fused", fwd_bf16, params, b)
    bench_fwd("int8 fused-s8 body", fwd_s8, qp, b)

# (2) eval throughput on a synthetic corpus
from ctagan_tpu.data.fixtures import make_corpus
from ctagan_tpu.train import build_trainer
from ctagan_tpu.utils.config import load_config

root = tempfile.mkdtemp(prefix="evalbench_")
lists = make_corpus(root, n_patients=6, slices_per_patient=16, size=512)
for eb in (1, 8):
    cfg = load_config(dict(
        name="P2p", size=512, compute_dtype="bfloat16", fused_body=True,
        eval_batch=eb,
        train_list=lists["train"], val_list=lists["val"],
        test_list=lists["test"],
        save_root=os.path.join(root, f"m{eb}") + "/",
        image_save=os.path.join(root, f"i{eb}") + "/",
        n_cpu=4, seed=0,
    ))
    t = build_trainer(cfg, quiet=True)
    n_val = len(t.val_dataset)
    t.validate()  # compile
    t0 = time.perf_counter()
    psnr, ssim = t.validate()
    dt = time.perf_counter() - t0
    print(f"validate eval_batch={eb}: {n_val} slices in {dt:.2f}s = "
          f"{n_val/dt:.1f} sl/s (psnr {psnr:.2f} ssim {ssim:.3f})", flush=True)
    n_test = len(t.test_dataset)
    t0 = time.perf_counter()
    agg = t.test(write_dicom=True)
    dt = time.perf_counter() - t0
    print(f"test eval_batch={eb}: {n_test} slices in {dt:.2f}s = "
          f"{n_test/dt:.1f} sl/s (PSNR {agg.get('PSNR'):.2f})", flush=True)
