"""LPIPS architecture tests (shape/invariance; real weights are gated)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from ctagan_tpu.ops.lpips import (
    alexnet_features,
    load_weights_from_torch,
    lpips_distance,
    make_lpips_fn,
    random_params,
)


@pytest.fixture(scope="module")
def params():
    return random_params(jax.random.PRNGKey(0))


def test_identical_images_zero_distance(params):
    img = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (64, 64)), jnp.float32)
    d = float(lpips_distance(params, img, img))
    assert abs(d) < 1e-6


def test_distance_grows_with_perturbation(params):
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(-1, 1, (64, 64)), jnp.float32)
    d_small = float(lpips_distance(params, img, img + 0.05))
    d_big = float(lpips_distance(params, img, img + 0.5))
    assert 0 < d_small < d_big


def test_feature_tap_shapes(params):
    x = jnp.zeros((1, 64, 64, 3))
    taps = alexnet_features(params, x)
    assert [t.shape[-1] for t in taps] == [64, 192, 384, 256, 256]
    # stride-4 stem then pools: 64 -> 15 -> 7 -> 7 ...
    assert taps[0].shape[1] == 15


def test_make_lpips_fn_gated_without_weights():
    assert make_lpips_fn(None) is None
    assert make_lpips_fn("/nonexistent/weights.pth") is None


def test_torch_weight_import_roundtrip(tmp_path, params):
    """Export torch-layout weights, re-import, check parity with a direct
    torch conv on the first tap."""
    feat_idx = [0, 3, 6, 8, 10]
    cfg = [(3, 64, 11), (64, 192, 5), (192, 384, 3), (384, 256, 3), (256, 256, 3)]
    sd = {}
    rng = np.random.default_rng(2)
    for fi, (ic, oc, k) in zip(feat_idx, cfg):
        sd[f"features.{fi}.weight"] = torch.tensor(
            rng.standard_normal((oc, ic, k, k)).astype(np.float32) * 0.05
        )
        sd[f"features.{fi}.bias"] = torch.zeros(oc)
    for i, (_, oc, _) in enumerate(cfg):
        sd[f"lin{i}.model.1.weight"] = torch.ones(1, oc, 1, 1) / oc
    p = tmp_path / "lpips.pth"
    torch.save(sd, p)

    loaded = load_weights_from_torch(str(p))
    fn = make_lpips_fn(str(p))
    assert fn is not None
    x = np.random.default_rng(3).uniform(-1, 1, (32, 32)).astype(np.float32)
    d = float(fn(jnp.asarray(x), jnp.asarray(x * 0.5)))
    assert np.isfinite(d) and d > 0

    # first conv parity vs torch
    xin = np.tile(x[None, :, :, None], (1, 1, 1, 3))
    xin_t = (xin - [-0.030, -0.088, -0.188]) / [0.458, 0.448, 0.450]
    want = torch.nn.functional.conv2d(
        torch.tensor(xin_t.transpose(0, 3, 1, 2), dtype=torch.float32),
        sd["features.0.weight"],
        sd["features.0.bias"],
        stride=4,
        padding=2,
    ).relu().numpy()
    got = np.asarray(
        alexnet_features(loaded, jnp.asarray(xin_t, jnp.float32))[0]
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-4)
