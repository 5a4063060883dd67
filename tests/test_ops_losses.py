"""Loss-surface tests (reference: trainer loss blocks + Model/HdGan.py GANLoss)."""
import numpy as np
import jax.numpy as jnp

from ctagan_tpu.ops import losses


def test_lsgan_loss_values():
    pred = jnp.array([[0.5]])
    np.testing.assert_allclose(float(losses.lsgan_loss(pred, True)), 0.25)
    np.testing.assert_allclose(float(losses.lsgan_loss(pred, False)), 0.25)
    np.testing.assert_allclose(float(losses.lsgan_loss(jnp.array([[1.0]]), True)), 0.0)


def test_l1_and_mse():
    a = jnp.array([1.0, -1.0])
    b = jnp.array([0.0, 0.0])
    np.testing.assert_allclose(float(losses.l1(a, b)), 1.0)
    np.testing.assert_allclose(float(losses.mse(a, b)), 1.0)


def test_multiscale_gan_loss_weights():
    # two scales, each final map constant 0 -> loss vs real = 1*1.8 + 1*0.2
    feats = [[jnp.zeros((1, 4, 4, 1))], [jnp.zeros((1, 2, 2, 1))]]
    got = float(losses.gan_loss_multiscale(feats, True))
    np.testing.assert_allclose(got, 1.8 + 0.2)
    np.testing.assert_allclose(float(losses.gan_loss_multiscale(feats, False)), 0.0)


def test_single_scale_gan_loss_pools_last_feature():
    feats = [jnp.ones((1, 8, 8, 3)), jnp.full((2, 4, 4, 1), 0.5)]
    got = float(losses.gan_loss_single(feats, True))
    np.testing.assert_allclose(got, 0.25)


def test_masked_correlation_loss():
    # window target selects right half; both images equal there -> loss from
    # the -1-filled background matching exactly -> 0
    wt = jnp.concatenate([jnp.zeros((1, 4, 2, 1)), jnp.ones((1, 4, 2, 1))], axis=2)
    pred = jnp.full((1, 4, 4, 1), 0.7)
    target = jnp.full((1, 4, 4, 1), 0.7)
    np.testing.assert_allclose(
        float(losses.masked_correlation_loss(pred, target, wt)), 0.0, atol=1e-7
    )
    # differ only in the masked-out half -> still 0
    pred2 = pred.at[:, :, :2, :].set(-0.9)
    np.testing.assert_allclose(
        float(losses.masked_correlation_loss(pred2, target, wt)), 0.0, atol=1e-7
    )
    # differ inside the mask -> positive, localized contribution
    pred3 = pred.at[:, :, 2:, :].set(0.2)
    np.testing.assert_allclose(
        float(losses.masked_correlation_loss(pred3, target, wt)), 0.25, atol=1e-6
    )


def test_feature_matching_loss():
    f = [[jnp.ones((1, 4, 4, 2)), jnp.zeros((1, 2, 2, 1))]]
    r = [[jnp.zeros((1, 4, 4, 2)), jnp.ones((1, 2, 2, 1))]]
    # only the non-final maps count: |1-0| * (1/1) * (4/4) = 1.0
    np.testing.assert_allclose(
        float(losses.feature_matching_loss(f, r, n_layers=3, num_d=1)), 1.0
    )
    # identical features -> 0
    np.testing.assert_allclose(
        float(losses.feature_matching_loss(f, f, n_layers=3, num_d=1)), 0.0
    )
