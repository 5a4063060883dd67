"""Int8 serving path: graph parity (exact mode) + quantization quality."""
import numpy as np
import jax
import jax.numpy as jnp

from ctagan_tpu.models import Generator
from ctagan_tpu.ops.quantize import (
    generator_dequant_forward,
    generator_int8_forward,
    quantize_generator,
    quantize_weight_per_channel,
    quantized_size_bytes,
)


def _init(size=64, n_res=3, seed=0):
    g = Generator(1, 1, n_residual_blocks=n_res)
    params = g.init(jax.random.PRNGKey(seed), jnp.zeros((1, size, size, 1)))
    x = jax.random.uniform(
        jax.random.PRNGKey(seed + 1), (2, size, size, 1), minval=-1, maxval=1
    )
    return g, params, x


def test_weight_quantizer_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 8, 16)) * 0.1
    q, scale = quantize_weight_per_channel(w)
    assert q.dtype == jnp.int8 and scale.shape == (16,)
    err = np.abs(np.asarray(q, np.float32) * np.asarray(scale) - np.asarray(w))
    # max error bounded by half a quantization step per channel
    assert np.all(err <= np.asarray(scale) * 0.5 + 1e-7)


def test_exact_mode_matches_generator_apply():
    # same graph with unrounded weights must reproduce the flax forward —
    # locks the padding/dilation/kernel-transform plumbing
    g, params, x = _init()
    ref = np.asarray(g.apply(params, x))
    qp = quantize_generator(params, exact=True)
    out = np.asarray(generator_dequant_forward(qp, x))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_int8_tracks_f32_output():
    g, params, x = _init()
    ref = np.asarray(g.apply(params, x))
    qp = quantize_generator(params)
    out = np.asarray(jax.jit(generator_int8_forward)(qp, x))
    mse = float(np.mean((out - ref) ** 2))
    psnr = 10.0 * np.log10(4.0 / max(mse, 1e-12))  # range [-1,1] -> peak 2
    assert psnr > 30.0, f"int8 deviates too much: {psnr:.1f} dB"


def test_quantized_tree_is_smaller():
    _, params, _ = _init(n_res=9)
    full = sum(
        np.asarray(p).nbytes for p in jax.tree.leaves(params)
    )
    qp = quantize_generator(params)
    assert quantized_size_bytes(qp) < 0.45 * full  # body is ~3.7x smaller


def test_int8_through_serving_service():
    import concurrent.futures

    from ctagan_tpu.serving.server import SynthesisService

    g, params, _ = _init(size=32)
    svc = SynthesisService(g, params, size=32, max_batch=2, quantize="int8")
    try:
        rng = np.random.default_rng(0)
        imgs = [rng.uniform(-1, 1, (32, 32)).astype(np.float32) for _ in range(4)]
        with concurrent.futures.ThreadPoolExecutor(4) as ex:
            outs = list(ex.map(svc.synthesize, imgs))
        ref = np.asarray(g.apply(params, np.stack(imgs)[..., None]))[..., 0]
        for r, o in zip(ref, outs):
            assert np.mean(np.abs(r - o)) < 0.05
    finally:
        svc.stop()
