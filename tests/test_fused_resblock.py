"""Parity: fused conv+IN residual body (ops/fused_resblock.py) vs the XLA
path. CPU runs the kernels in interpret mode; on TPU the same tests compile
through Mosaic."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctagan_tpu.models.generator import Generator
from ctagan_tpu.models.layers import ResidualBlock
from ctagan_tpu.ops.fused_resblock import (
    can_fuse,
    conv3x3_reflect_stats,
    fused_residual_block,
)


def _rand(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape).astype(np.float32)
    )


def test_conv_stats_matches_lax_conv():
    x = _rand((2, 16, 128, 128))
    w = _rand((3, 3, 128, 128), 1) * 0.05
    b = _rand((128,), 2)
    out, stats = conv3x3_reflect_stats(x, w, b)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    ref = jax.lax.conv_general_dilated(
        xp, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    np.testing.assert_allclose(out, ref, atol=2e-5)
    np.testing.assert_allclose(
        stats[:, 0], jnp.sum(ref, axis=(1, 2)), rtol=1e-4
    )
    np.testing.assert_allclose(
        stats[:, 1], jnp.sum(ref * ref, axis=(1, 2)), rtol=1e-4
    )


# bf16: differences are single-ulp rounding from the different conv
# accumulation order (9 MXU matmuls vs XLA's conv) — atol covers 1 ulp at
# the activations' magnitude
@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 1e-4), (jnp.bfloat16, 5e-2)])
def test_block_parity(dtype, atol):
    x = _rand((2, 8, 128, 128)).astype(dtype)
    ref_block = ResidualBlock(128, dtype=dtype)
    params = ref_block.init(jax.random.PRNGKey(0), x)
    fused_block = ResidualBlock(128, dtype=dtype, fused=True)
    # identical param trees: fused checkpoints interchange with unfused
    assert jax.tree_util.tree_structure(
        fused_block.init(jax.random.PRNGKey(0), x)
    ) == jax.tree_util.tree_structure(params)
    ref = ref_block.apply(params, x)
    out = fused_block.apply(params, x)
    np.testing.assert_allclose(
        out.astype(jnp.float32), ref.astype(jnp.float32), atol=atol
    )


def test_generator_fused_body_parity():
    # input 16x512 -> body 4x128x128: fusable at reduced scale
    g_ref = Generator(1, 1, n_residual_blocks=2, base_features=32)
    g_fused = Generator(
        1, 1, n_residual_blocks=2, base_features=32, fused_body=True
    )
    x = _rand((1, 16, 512, 1))
    params = g_ref.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(
        g_fused.init(jax.random.PRNGKey(0), x)
    ) == jax.tree_util.tree_structure(params)
    np.testing.assert_allclose(
        g_fused.apply(params, x), g_ref.apply(params, x), atol=1e-4
    )


def test_generator_fused_body_zero_blocks():
    # n_residual_blocks=0: the chain is a no-op, fused == unfused (ADVICE r1)
    g_ref = Generator(1, 1, n_residual_blocks=0, base_features=32)
    g_fused = Generator(
        1, 1, n_residual_blocks=0, base_features=32, fused_body=True
    )
    x = _rand((1, 16, 512, 1))
    params = g_ref.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        g_fused.apply(params, x), g_ref.apply(params, x), atol=1e-4
    )


def test_generator_fused_body_fallback():
    # body 16x16x256: W%128 != 0 -> silently identical to the XLA path
    assert not can_fuse((1, 16, 16, 256))
    g_ref = Generator(1, 1, n_residual_blocks=1)
    g_fused = Generator(1, 1, n_residual_blocks=1, fused_body=True)
    x = _rand((1, 64, 64, 1))
    params = g_ref.init(jax.random.PRNGKey(0), x)
    np.testing.assert_array_equal(g_fused.apply(params, x), g_ref.apply(params, x))


def test_fused_block_odd_rows():
    # H not divisible by 8: block_rows degrades (H=4 -> R=4)
    x = _rand((1, 4, 128, 128))
    w1, b1 = _rand((3, 3, 128, 128), 1) * 0.05, _rand((128,), 2)
    w2, b2 = _rand((3, 3, 128, 128), 3) * 0.05, _rand((128,), 4)
    out = fused_residual_block(x, w1, b1, w2, b2)
    block = ResidualBlock(128)
    params = {
        "params": {
            "ConvTorch_0": {"Conv_0": {"kernel": w1, "bias": b1}},
            "ConvTorch_1": {"Conv_0": {"kernel": w2, "bias": b2}},
        }
    }
    np.testing.assert_allclose(out, block.apply(params, x), atol=1e-4)


@pytest.mark.slow
def test_trainer_fused_body_config(tmp_path):
    # config knob routes val/test through g_eval with fused_body=True;
    # at 64² the body can't fuse, so this also locks the silent fallback
    from ctagan_tpu.data.fixtures import make_corpus
    from ctagan_tpu.train import build_trainer
    from ctagan_tpu.utils.config import load_config

    lists = make_corpus(
        str(tmp_path / "corpus"), n_patients=2, slices_per_patient=2, size=64
    )
    cfg = load_config(
        {
            "name": "P2p",
            "size": 64,
            "batchSize": 1,
            "n_epochs": 1,
            "decay_epoch": 1,
            "save_root": str(tmp_path / "save"),
            "image_save": str(tmp_path / "img"),
            "train_list": lists["train"],
            "val_list": lists["val"],
            "test_list": lists["test"],
            "fused_body": True,
        }
    )
    tr = build_trainer(cfg)
    assert tr.g_eval.fused_body and not tr.g_model.fused_body
    psnr, ssim_v = tr.validate()
    assert np.isfinite(psnr)


def test_conv_stats_skip_stream():
    # skip variant: x_new = skip + norm(x) computed in-kernel, convolved,
    # and returned — must match doing the epilogue in XLA first
    x = _rand((2, 8, 128, 128), 10)
    skip = _rand((2, 8, 128, 128), 11)
    w = _rand((3, 3, 128, 128), 12) * 0.05
    b = _rand((128,), 13)
    mean = jnp.mean(x, axis=(1, 2))
    rstd = 1.0 / (jnp.std(x, axis=(1, 2)) + 1e-3)
    norm = jnp.stack([mean, rstd], axis=1)
    out, stats, x_new = conv3x3_reflect_stats(x, w, b, norm=norm, skip=skip)
    x_new_ref = skip + (
        (x - mean[:, None, None, :]) * rstd[:, None, None, :]
    ).astype(x.dtype)
    np.testing.assert_allclose(x_new, x_new_ref, atol=1e-5)
    out_ref, _ = conv3x3_reflect_stats(x_new_ref, w, b)
    np.testing.assert_allclose(out, out_ref, atol=2e-5)


def test_fused_chain_matches_blockwise():
    from ctagan_tpu.ops.fused_resblock import fused_residual_chain

    x = _rand((1, 8, 128, 128), 20)
    params = []
    for i in range(3):
        params.append((
            _rand((3, 3, 128, 128), 21 + 3 * i) * 0.05,
            _rand((128,), 22 + 3 * i) * 0.1,
            _rand((3, 3, 128, 128), 23 + 3 * i) * 0.05,
            _rand((128,), 24 + 3 * i) * 0.1,
        ))
    got = fused_residual_chain(x, params)
    want = x
    for k1, b1, k2, b2 in params:
        want = fused_residual_block(want, k1, b1, k2, b2)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_generator_fused_up_path_parity():
    # base_features=64 -> up path channels 128/64: the fused convT kernels
    # engage (body 4x128x256, up1 8x256x128, up2 16x512x64)
    import jax.numpy as jnp  # noqa

    g_ref = Generator(1, 1, n_residual_blocks=1, base_features=64,
                      tap_heads=False)
    g_fused = Generator(1, 1, n_residual_blocks=1, base_features=64,
                        fused_body=True, tap_heads=False)
    x = _rand((1, 16, 512, 1))
    params = g_ref.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(
        g_fused.init(jax.random.PRNGKey(0), x)
    ) == jax.tree_util.tree_structure(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_fused.init(jax.random.PRNGKey(0), x)),
        jax.tree_util.tree_leaves(params),
    ):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(
        g_fused.apply(params, x), g_ref.apply(params, x), atol=2e-4
    )


def test_fused_chain_bfloat16():
    from ctagan_tpu.ops.fused_resblock import fused_residual_chain

    x = _rand((1, 8, 128, 128), 30).astype(jnp.bfloat16)
    params = [tuple(_rand(s, 31 + i * 4 + j) * (0.05 if len(s) > 1 else 0.1)
                    for j, s in enumerate(((3, 3, 128, 128), (128,),
                                           (3, 3, 128, 128), (128,))))
              for i in range(2)]
    got = fused_residual_chain(x, params)
    want = x
    for k1, b1, k2, b2 in params:
        want = fused_residual_block(want, k1, b1, k2, b2)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        got.astype(jnp.float32), want.astype(jnp.float32), atol=5e-2
    )


def test_chain_in_norm_matches_explicit_prenorm():
    from ctagan_tpu.ops.fused_resblock import (
        _stats_to_norm,
        fused_residual_chain,
    )

    raw = _rand((1, 8, 128, 128), 40)
    params = [tuple(_rand(s, 41 + j) * (0.05 if len(s) > 1 else 0.1)
                    for j, s in enumerate(((3, 3, 128, 128), (128,),
                                           (3, 3, 128, 128), (128,))))]
    rawf = raw.astype(jnp.float32)
    stats = jnp.stack([jnp.sum(rawf, axis=(1, 2)),
                       jnp.sum(rawf * rawf, axis=(1, 2))], axis=1)
    norm = _stats_to_norm(stats, float(8 * 128), 1e-5)
    got = fused_residual_chain(raw, params, in_norm=norm, in_relu=True)
    xn = jnp.maximum(
        (rawf - norm[:, 0][:, None, None, :]) * norm[:, 1][:, None, None, :],
        0.0,
    ).astype(raw.dtype)
    want = fused_residual_chain(xn, params)
    np.testing.assert_allclose(got, want, atol=2e-5)
