"""Reference-checkpoint import: structural compatibility of the key maps
(synthetic state dicts with the reference's exact key names/shapes)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ctagan_tpu.models import Discriminator, Generator, NLayerDiscriminator, RegNet
from ctagan_tpu.models.reg import NDF, NUF
from ctagan_tpu.models.torch_import import (
    import_discriminator,
    import_generator,
    import_nlayer_discriminator,
    import_regnet,
)


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32) * 0.05


def _gen_state_dict(rng):
    sd = {}
    for key, (o, i, k) in {
        "model_head.1": (64, 1, 7),
        "model_head.4": (128, 64, 3),
        "model_head.7": (256, 128, 3),
        "model_tail.7": (1, 64, 7),
    }.items():
        sd[f"{key}.weight"] = _rand(rng, o, i, k, k)
        sd[f"{key}.bias"] = _rand(rng, o)
    for b in range(9):
        for c in (1, 5):
            sd[f"model_body.{b}.conv_block.{c}.weight"] = _rand(rng, 256, 256, 3, 3)
            sd[f"model_body.{b}.conv_block.{c}.bias"] = _rand(rng, 256)
    # ConvTranspose2d weights are (in, out, kh, kw)
    sd["model_tail.0.weight"] = _rand(rng, 256, 128, 3, 3)
    sd["model_tail.0.bias"] = _rand(rng, 128)
    sd["model_tail.3.weight"] = _rand(rng, 128, 64, 3, 3)
    sd["model_tail.3.bias"] = _rand(rng, 64)
    return sd


def _tree_shapes(t):
    return jax.tree.map(lambda x: jnp.asarray(x).shape, t)


def test_generator_import_structure_and_apply():
    rng = np.random.default_rng(0)
    imported = import_generator(_gen_state_dict(rng))
    g = Generator(1, 1)
    ref = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    assert _tree_shapes(imported) == _tree_shapes(ref)
    y = g.apply(imported, jnp.zeros((1, 64, 64, 1)))
    assert y.shape == (1, 64, 64, 1)
    assert np.all(np.isfinite(np.asarray(y)))


def test_discriminator_import():
    rng = np.random.default_rng(1)
    sd = {}
    for idx, (o, i) in zip((0, 2, 5, 8, 11), [(64, 1), (128, 64), (256, 128), (512, 256), (1, 512)]):
        sd[f"model.{idx}.weight"] = _rand(rng, o, i, 4, 4)
        sd[f"model.{idx}.bias"] = _rand(rng, o)
    imported = import_discriminator(sd)
    d = Discriminator(1)
    ref = d.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    assert _tree_shapes(imported) == _tree_shapes(ref)
    assert d.apply(imported, jnp.zeros((2, 64, 64, 1))).shape == (2, 1)


def test_nlayer_import():
    rng = np.random.default_rng(2)
    sd = {}
    chans = [(64, 1), (128, 64), (256, 128), (512, 256), (1, 512)]
    for n, (o, i) in enumerate(chans):
        sd[f"model{n}.0.weight"] = _rand(rng, o, i, 4, 4)
        sd[f"model{n}.0.bias"] = _rand(rng, o)
    imported = import_nlayer_discriminator(sd)
    d = NLayerDiscriminator(1, get_interm_feat=True)
    ref = d.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    assert _tree_shapes(imported) == _tree_shapes(ref)


def test_regnet_import_structure_and_apply():
    rng = np.random.default_rng(3)
    sd = {}

    def conv(key, o, i, k):
        sd[f"{key}.weight"] = _rand(rng, o, i, k, k)
        sd[f"{key}.bias"] = _rand(rng, o)

    in_nf = 2
    for i, nf in enumerate(NDF):
        conv(f"offset_map.down_{i + 1}.conv_0.conv2d", nf, in_nf, 3)
        for c in (1, 5):
            conv(f"offset_map.down_{i + 1}.conv_0.resnet_block.model.0.conv_block.{c}", nf, nf, 3)
        in_nf = nf
    conv("offset_map.c1.conv2d", 128, 64, 1)
    for j in range(3):
        for c in (1, 5):
            conv(f"offset_map.t.model.{j}.conv_block.{c}", 128, 128, 3)
    conv("offset_map.c2.conv2d", 64, 128, 1)
    in_nf = 64
    for i, nf in enumerate(NUF):
        conv_num = len(NDF) - i
        skip = NDF[conv_num - 1]
        conv(f"offset_map.up_{conv_num}.conv2d", nf, in_nf + skip, 3)
        in_nf = nf
    for c in (1, 5):
        conv(f"offset_map.refine.0.model.0.conv_block.{c}", 32, 32, 3)
    conv("offset_map.refine.1.conv2d", 32, 32, 1)
    conv("offset_map.output.conv2d", 2, 32, 3)

    imported = import_regnet(sd)
    r = RegNet()
    a = jnp.zeros((1, 128, 128, 1))
    ref = r.init(jax.random.PRNGKey(0), a, a)
    assert _tree_shapes(imported) == _tree_shapes(ref)
    flow = r.apply(imported, a + 0.1, a - 0.1)
    assert flow.shape == (1, 128, 128, 2)


# --- export (torch_export.py): the exact inverse maps -------------------

from ctagan_tpu.models.torch_export import (  # noqa: E402
    discriminator_state_dict,
    generator_state_dict,
    nlayer_discriminator_state_dict,
    regnet_state_dict,
    save_state_dict,
)


def _sd_allclose(a, b):
    assert sorted(a) == sorted(b), (sorted(a)[:5], sorted(b)[:5])
    for k in a:
        np.testing.assert_allclose(a[k], np.asarray(b[k]), rtol=0, atol=0)


def test_generator_export_roundtrip():
    rng = np.random.default_rng(10)
    sd = _gen_state_dict(rng)
    _sd_allclose(sd, generator_state_dict(import_generator(sd)))
    # and the other direction: flax-init tree -> sd -> tree
    g = Generator(1, 1, n_residual_blocks=2)
    tree = g.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 1)))
    back = import_generator(generator_state_dict(tree))
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x), np.asarray(y)),
        tree, back,
    )


def test_discriminator_export_roundtrip():
    d = Discriminator(1)
    tree = d.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 1)))
    back = import_discriminator(discriminator_state_dict(tree))
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x), np.asarray(y)),
        tree, back,
    )


def test_nlayer_export_roundtrip():
    d = NLayerDiscriminator(1, get_interm_feat=True)
    tree = d.init(jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 1)))
    back = import_nlayer_discriminator(nlayer_discriminator_state_dict(tree))
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x), np.asarray(y)),
        tree, back,
    )


def test_regnet_export_roundtrip():
    r = RegNet()
    a = jnp.zeros((1, 128, 128, 1))
    tree = r.init(jax.random.PRNGKey(4), a, a)
    back = import_regnet(regnet_state_dict(tree))
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x), np.asarray(y)),
        tree, back,
    )


def test_save_state_dict_torch_loadable(tmp_path):
    torch = pytest.importorskip("torch")
    g = Generator(1, 1, n_residual_blocks=1)
    tree = g.init(jax.random.PRNGKey(5), jnp.zeros((1, 64, 64, 1)))
    sd = generator_state_dict(tree)
    p = str(tmp_path / "netG_A2B_export.pth")
    save_state_dict(sd, p)
    loaded = torch.load(p, map_location="cpu", weights_only=True)
    assert isinstance(loaded["model_head.1.weight"], torch.Tensor)
    _sd_allclose(sd, {k: v.numpy() for k, v in loaded.items()})
