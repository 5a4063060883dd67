"""Warp parity vs torch.nn.functional.grid_sample (align_corners=True,
padding_mode='border') — the exact configuration of the reference's
Transformer_2D (trainer/transformer.py:22-29)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from ctagan_tpu.ops.warp import warp2d, grid_sample_border, smoothing_loss


def _torch_warp(src_nchw, flow_n2hw):
    """The reference Transformer_2D forward, built from torch primitives."""
    src = torch.tensor(src_nchw)
    flow = torch.tensor(flow_n2hw)
    b, _, h, w = flow.shape
    grids = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    grid = torch.stack(grids).float().repeat(b, 1, 1, 1)
    new_locs = grid + flow
    for i, s in enumerate((h, w)):
        new_locs[:, i] = 2 * (new_locs[:, i] / (s - 1) - 0.5)
    new_locs = new_locs.permute(0, 2, 3, 1)[..., [1, 0]]
    return F.grid_sample(src, new_locs, align_corners=True, padding_mode="border")


@pytest.mark.parametrize("seed", [0, 1])
def test_warp2d_matches_torch_grid_sample(seed):
    rng = np.random.default_rng(seed)
    n, h, w, c = 2, 24, 20, 3
    src = rng.standard_normal((n, c, h, w)).astype(np.float32)
    flow = (rng.standard_normal((n, 2, h, w)) * 5).astype(np.float32)

    want = _torch_warp(src, flow).numpy()
    got = np.asarray(
        warp2d(
            jnp.asarray(src.transpose(0, 2, 3, 1)),
            jnp.asarray(flow.transpose(0, 2, 3, 1)),
        )
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_warp_zero_flow_is_identity():
    rng = np.random.default_rng(3)
    src = rng.standard_normal((1, 16, 16, 1)).astype(np.float32)
    out = np.asarray(warp2d(jnp.asarray(src), jnp.zeros((1, 16, 16, 2))))
    np.testing.assert_allclose(out, src, atol=1e-6)


def test_warp_border_clamps():
    src = jnp.arange(16.0).reshape(1, 4, 4, 1)
    big_flow = jnp.full((1, 4, 4, 2), 100.0)  # way off the grid
    out = np.asarray(warp2d(src, big_flow))
    np.testing.assert_allclose(out, 15.0)  # bottom-right pixel everywhere


def test_warp_is_differentiable_in_flow_and_src():
    src = jnp.ones((1, 8, 8, 1))
    flow = jnp.zeros((1, 8, 8, 2))
    g_src, g_flow = jax.grad(lambda s, f: jnp.sum(warp2d(s, f) ** 2), argnums=(0, 1))(
        src, flow
    )
    assert g_src.shape == src.shape and g_flow.shape == flow.shape
    assert np.all(np.isfinite(np.asarray(g_src)))


def test_smoothing_loss_matches_reference_formula():
    rng = np.random.default_rng(4)
    flow = rng.standard_normal((2, 10, 12, 2)).astype(np.float32)
    t = torch.tensor(flow.transpose(0, 3, 1, 2))
    dy = torch.abs(t[:, :, 1:, :] - t[:, :, :-1, :]) ** 2
    dx = torch.abs(t[:, :, :, 1:] - t[:, :, :, :-1]) ** 2
    want = (dx.mean() + dy.mean()).item()
    got = float(smoothing_loss(jnp.asarray(flow)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_grid_sample_border_arbitrary_coords():
    src = jnp.arange(12.0).reshape(1, 3, 4, 1)
    cy = jnp.array([[[0.5, 2.0]]])
    cx = jnp.array([[[0.5, 3.0]]])
    out = np.asarray(grid_sample_border(src, cy, cx))
    np.testing.assert_allclose(out[0, 0, 0, 0], (0 + 1 + 4 + 5) / 4.0)
    np.testing.assert_allclose(out[0, 0, 1, 0], 11.0)


@pytest.mark.parametrize("r", [2, 4])
def test_warp2d_local_matches_exact_for_small_flows(r):
    from ctagan_tpu.ops.warp import warp2d_local

    rng = np.random.default_rng(10)
    src = jnp.asarray(rng.standard_normal((2, 24, 20, 1)).astype(np.float32))
    flow = jnp.asarray(
        (rng.uniform(-1, 1, (2, 24, 20, 2)) * (r - 0.5)).astype(np.float32)
    )
    exact = warp2d(src, flow)
    fast = warp2d_local(src, flow, max_displacement=r)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=2e-5)


def test_warp2d_local_zero_flow_identity():
    from ctagan_tpu.ops.warp import warp2d_local

    src = jnp.asarray(
        np.random.default_rng(11).standard_normal((1, 16, 16, 1)).astype(np.float32)
    )
    out = warp2d_local(src, jnp.zeros((1, 16, 16, 2)), max_displacement=3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(src), atol=1e-6)


def test_warp2d_local_saturates_large_flows():
    from ctagan_tpu.ops.warp import warp2d_local

    src = jnp.arange(16.0).reshape(1, 4, 4, 1)
    big = jnp.full((1, 4, 4, 2), 100.0)
    out = warp2d_local(src, big, max_displacement=2)
    # displacement saturates at +2 (clamped), not at the border like warp2d
    exact_clamped = warp2d(src, jnp.full((1, 4, 4, 2), 2.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(exact_clamped), atol=1e-6)


def test_warp2d_local_differentiable():
    from ctagan_tpu.ops.warp import warp2d_local

    src = jnp.ones((1, 8, 8, 1))
    flow = jnp.full((1, 8, 8, 2), 0.3)
    gs, gf = jax.grad(
        lambda s, f: jnp.sum(warp2d_local(s, f, 2) ** 2), argnums=(0, 1)
    )(src, flow)
    assert np.all(np.isfinite(np.asarray(gs))) and np.all(np.isfinite(np.asarray(gf)))


# ---------------------------------------------------------------------------
# warp2d_dense: exact ring warp with the scatter-free custom VJP
# ---------------------------------------------------------------------------

from ctagan_tpu.ops import warp as warp_mod
from ctagan_tpu.ops.warp import warp2d_dense


@pytest.mark.parametrize("seed", [0, 1])
def test_warp2d_dense_matches_torch_grid_sample(seed):
    rng = np.random.default_rng(seed)
    n, h, w, c = 2, 24, 20, 3
    src = rng.standard_normal((n, c, h, w)).astype(np.float32)
    flow = (rng.standard_normal((n, 2, h, w)) * 5).astype(np.float32)
    want = _torch_warp(src, flow).numpy()
    got = np.asarray(
        warp2d_dense(
            jnp.asarray(src.transpose(0, 2, 3, 1)),
            jnp.asarray(flow.transpose(0, 2, 3, 1)),
        )
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_warp2d_dense_vjp_matches_autodiff_of_gather_warp():
    rng = np.random.default_rng(3)
    n, h, w, c = 2, 16, 16, 2
    src = jnp.asarray(rng.standard_normal((n, h, w, c)).astype(np.float32))
    # mixture of interior and clamped (out-of-range) coordinates
    flow = jnp.asarray((rng.standard_normal((n, h, w, 2)) * 6).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((n, h, w, c)).astype(np.float32))
    ds_ref, df_ref = jax.vjp(warp2d, src, flow)[1](g)
    ds, df = jax.vjp(warp2d_dense, src, flow)[1](g)
    np.testing.assert_allclose(ds, ds_ref, atol=1e-5)
    np.testing.assert_allclose(df, df_ref, atol=1e-5)


def test_warp2d_dense_fallback_branch(monkeypatch):
    # force the offset rectangle over the term budget -> gather/scatter branch
    monkeypatch.setattr(warp_mod, "_DENSE_MAX_TERMS", 3)
    rng = np.random.default_rng(4)
    n, h, w, c = 1, 12, 12, 1
    src = jnp.asarray(rng.standard_normal((n, h, w, c)).astype(np.float32))
    flow = jnp.asarray((rng.standard_normal((n, h, w, 2)) * 3).astype(np.float32))
    g = jnp.ones((n, h, w, c), jnp.float32)
    np.testing.assert_allclose(
        warp2d_dense(src, flow), warp2d(src, flow), atol=1e-6
    )
    ds_ref, df_ref = jax.vjp(warp2d, src, flow)[1](g)
    ds, df = jax.vjp(warp2d_dense, src, flow)[1](g)
    np.testing.assert_allclose(ds, ds_ref, atol=1e-6)
    np.testing.assert_allclose(df, df_ref, atol=1e-6)


def test_warp2d_dense_zero_flow_identity_and_jit():
    rng = np.random.default_rng(5)
    src = jnp.asarray(rng.standard_normal((1, 8, 8, 1)).astype(np.float32))
    out = jax.jit(warp2d_dense)(src, jnp.zeros((1, 8, 8, 2)))
    np.testing.assert_allclose(out, src, atol=1e-6)


from ctagan_tpu.ops.warp import warp2d_adaptive


@pytest.mark.parametrize("scale,desc", [(2.0, "small->shift branch"), (9.0, "large->gather branch")])
def test_warp2d_adaptive_exact_both_branches(scale, desc):
    rng = np.random.default_rng(6)
    n, h, w, c = 1, 16, 16, 2
    src = jnp.asarray(rng.standard_normal((n, h, w, c)).astype(np.float32))
    flow = jnp.asarray((rng.standard_normal((n, h, w, 2)) * scale).astype(np.float32))
    if scale > 4:
        assert float(jnp.max(jnp.abs(flow))) > 4  # really exercises gather
    np.testing.assert_allclose(
        warp2d_adaptive(src, flow), warp2d(src, flow), atol=2e-5
    )
    g = jnp.asarray(rng.standard_normal((n, h, w, c)).astype(np.float32))
    ds_ref, df_ref = jax.vjp(warp2d, src, flow)[1](g)
    ds, df = jax.vjp(lambda s, f: warp2d_adaptive(s, f), src, flow)[1](g)
    np.testing.assert_allclose(ds, ds_ref, atol=2e-5)
    np.testing.assert_allclose(df, df_ref, atol=2e-5)


def test_warp_variants_bfloat16_grads():
    # bf16 src promotes to f32 in all formulations; grads must flow with
    # matching dtypes through adaptive (both branches) and dense (+fallback)
    rng = np.random.default_rng(7)
    src = jnp.asarray(rng.standard_normal((1, 16, 16, 1)).astype(np.float32)).astype(jnp.bfloat16)
    g32 = jnp.ones((1, 16, 16, 1), jnp.float32)
    for scale in (2.0, 9.0):
        flow = jnp.asarray((rng.standard_normal((1, 16, 16, 2)) * scale).astype(np.float32))
        for fn in (warp2d_adaptive, warp2d_dense, warp2d):
            out, vjp = jax.vjp(fn, src, flow)
            ds, df = vjp(g32.astype(out.dtype))
            assert ds.dtype == src.dtype and df.dtype == flow.dtype
            assert np.isfinite(np.asarray(df, np.float32)).all()
