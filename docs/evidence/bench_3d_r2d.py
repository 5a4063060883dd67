"""A/B: Generator3D tap_head (im2col (3,7,7) C_in=1 head) on v5e —
fwd at D8 512^2 and D16 256^2 bf16, plus a combined tap_head+tap_tail row.

Run AFTER the quality run frees the chip; never concurrently.
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from ctagan_tpu.models.volumetric import Generator3D

rng = np.random.default_rng(0)


def timeit(tag, fn, *args, iters=20, loops=3):
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    best = np.inf
    for _ in range(loops):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(np.asarray(out).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{tag}: {best * 1e3:.2f} ms", flush=True)
    return best


print("devices:", jax.devices(), flush=True)

for d, hw in ((8, 512), (16, 256)):
    x = jnp.asarray(
        rng.uniform(-1, 1, (1, d, hw, hw, 1)).astype(np.float32), jnp.bfloat16
    )
    base = Generator3D(dtype=jnp.bfloat16, tap_head=False, tap_tail=False)
    params = base.init(jax.random.PRNGKey(0), x)
    for head, tail in ((False, False), (False, True), (True, True)):
        g = Generator3D(dtype=jnp.bfloat16, tap_head=head, tap_tail=tail)
        dt = timeit(
            f"G3D fwd D{d} {hw}^2 [head={head} tail={tail}]",
            jax.jit(lambda p, a, g=g: g.apply(p, a)), params, x,
        )
        print(f"  -> {d / dt:.1f} slices/s", flush=True)
