"""Shape/semantics tests for the U-Net family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mednet.models import ResidualUNet3D, UNet3D, UNet3DBase, UNetConfig
from tpu_mednet.models.unet import create_feature_maps


def test_create_feature_maps():
    assert create_feature_maps(64, 4) == (64, 128, 256, 512)
    assert create_feature_maps(32, 5) == (32, 64, 128, 256, 512)


def make_tiny(block="residual", **kw):
    cfg = UNetConfig(
        in_channels=1,
        out_channels=3,
        f_maps=4,
        num_levels=2,
        block=block,
        layer_order="cge" if block == "residual" else "crg",
        num_groups=2,
        dtype=jnp.float32,
        **kw,
    )
    return UNet3DBase(config=cfg)


@pytest.mark.parametrize("block", ["double", "residual"])
def test_unet_forward_shape(block):
    model = make_tiny(block)
    x = jnp.ones((2, 16, 16, 16, 1))
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (2, 16, 16, 16, 3)
    assert y.dtype == jnp.float32


def test_unet_testing_mode_softmax():
    model = make_tiny()
    x = jnp.ones((1, 8, 8, 8, 1))
    variables = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(variables, x, testing=False)
    probs = model.apply(variables, x, testing=True)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(probs, axis=-1)), 1.0, rtol=1e-5
    )
    # training mode returns raw logits (no softmax)
    assert not np.allclose(np.asarray(jnp.sum(logits, axis=-1)), 1.0)


def test_unet_skip_final_activation():
    cfg = UNetConfig(
        in_channels=1, out_channels=2, f_maps=4, num_levels=2,
        skip_final_activation=True, num_groups=2, dtype=jnp.float32,
    )
    model = UNet3DBase(config=cfg)
    x = jnp.ones((1, 8, 8, 8, 1))
    variables = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(variables, x, testing=False)
    test_out = model.apply(variables, x, testing=True)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(test_out))


def test_residual_unet_level_channels():
    """5-level residual net: per-level features follow 32*2^k (model.py:148-150)."""
    model = ResidualUNet3D(in_channels=1, out_channels=2, f_maps=8, dtype=jnp.float32)
    x = jnp.ones((1, 32, 32, 32, 1))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    assert set(params.keys()) == (
        {f"encoder{i}" for i in range(5)} | {f"decoder{i}" for i in range(4)} | {"final_conv"}
    )
    for i, ch in enumerate([8, 16, 32, 64, 128]):
        kernel = params[f"encoder{i}"]["block"]["conv1"]["conv"]["kernel"]
        assert kernel.shape[-1] == ch


def test_unet3d_default_levels():
    model = UNet3D(in_channels=2, out_channels=3, f_maps=4, dtype=jnp.float32,
                   num_groups=2)
    x = jnp.ones((1, 16, 16, 16, 2))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    assert sum(k.startswith("encoder") for k in params) == 4
    assert sum(k.startswith("decoder") for k in params) == 3


def test_unet_gradients_flow():
    model = make_tiny()
    x = jnp.ones((1, 8, 8, 8, 1))
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss_fn(params):
        y = model.apply({"params": params}, x)
        return jnp.mean(y**2)

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.any(np.asarray(l) != 0) for l in leaves)


def test_unet_jit_compiles_once():
    model = make_tiny()
    x = jnp.ones((1, 8, 8, 8, 1))
    variables = model.init(jax.random.PRNGKey(0), x)
    fwd = jax.jit(lambda v, x: model.apply(v, x))
    y1 = fwd(variables, x)
    y2 = fwd(variables, x + 1)
    assert y1.shape == y2.shape


def test_factories_honor_num_levels():
    """num_levels is part of the reference constructor API (model.py:120)
    and must not be silently swallowed by the factories' **kwargs."""
    from tpu_mednet.models import ResidualUNet3D, UNet3D

    assert ResidualUNet3D(in_channels=1, out_channels=2, f_maps=8,
                          num_levels=3).config.num_levels == 3
    assert UNet3D(in_channels=1, out_channels=2, f_maps=8,
                  num_levels=2).config.num_levels == 2
    # defaults match the reference (model.py:11-110 / 113-213)
    assert UNet3D(in_channels=1, out_channels=2).config.num_levels == 4
    assert ResidualUNet3D(in_channels=1, out_channels=2).config.num_levels == 5


def test_factories_reject_unknown_kwargs():
    """Typoed/unsupported kwargs must raise, not warn-and-train-defaults;
    only the reference's construction-time 'testing' flag (model.py:32,74)
    is warn-ignored."""
    import pytest

    from tpu_mednet.models import ResidualUNet3D, UNet3D

    with pytest.raises(TypeError, match="num_group"):
        ResidualUNet3D(in_channels=1, out_channels=2, num_group=4)  # typo
    with pytest.raises(TypeError, match="fmaps"):
        UNet3D(in_channels=1, out_channels=2, fmaps=8)  # typo of f_maps
    # known compat kwarg still accepted (apply()-time concern here)
    m = ResidualUNet3D(in_channels=1, out_channels=2, testing=True)
    assert m.config.num_levels == 5


def test_residual_rejects_indivisible_patch():
    """Residual (sum-join) U-Net fails fast on spatial extents that don't
    survive the pool/up round trip, instead of a broadcast error."""
    import pytest

    from tpu_mednet.models import UNet3DBase, UNetConfig

    m = UNet3DBase(config=UNetConfig(
        in_channels=1, out_channels=2, f_maps=4, num_levels=3,
        block="residual", layer_order="cge", num_groups=2,
        dtype=jnp.float32,
    ))
    x = jnp.zeros((1, 24, 24, 24, 1))  # 24 % 2^2 == 0 -> ok
    m.init(jax.random.PRNGKey(0), x, train=False)
    bad = jnp.zeros((1, 18, 24, 24, 1))  # 18 % 4 != 0
    with pytest.raises(ValueError, match="divisible by 4"):
        m.init(jax.random.PRNGKey(0), bad, train=False)
