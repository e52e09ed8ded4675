"""Unit tests for the conv-block zoo (shape + semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mednet.models.blocks import (
    ConvLayer,
    DecoderStage,
    DoubleConv,
    EncoderStage,
    ExtResNetBlock,
    FinalConv,
    group_count,
    pool3d,
    validate_order,
)


def init_apply(module, x, train=True, **kw):
    variables = module.init(jax.random.PRNGKey(0), x, train=train, **kw)
    if "batch_stats" in variables:
        y, _ = module.apply(x=x, train=train, variables=variables,
                            mutable=["batch_stats"], **kw)
        return y
    return module.apply(variables, x, train=train, **kw)


def test_validate_order():
    validate_order("crg")
    with pytest.raises(ValueError):
        validate_order("rg")  # nonlinearity first
    with pytest.raises(ValueError):
        validate_order("gr")  # no conv
    with pytest.raises(ValueError):
        validate_order("cx")  # unknown char


def test_group_count_clamp():
    assert group_count(4, 8) == 1  # fewer channels than groups -> 1 group
    assert group_count(16, 8) == 8
    with pytest.raises(ValueError):
        group_count(12, 8)


@pytest.mark.parametrize("order", ["crg", "gcr", "cge", "cl", "cbr"])
def test_conv_layer_shapes(order):
    x = jnp.ones((2, 8, 8, 8, 3))
    m = ConvLayer(out_channels=16, order=order)
    y = init_apply(m, x)
    assert y.shape == (2, 8, 8, 8, 16)


def test_conv_layer_bias_only_without_norm():
    x = jnp.ones((1, 4, 4, 4, 2))
    params_nonorm = ConvLayer(out_channels=4, order="cr").init(
        jax.random.PRNGKey(0), x
    )["params"]
    assert "bias" in params_nonorm["conv"]
    params_norm = ConvLayer(out_channels=4, order="crg").init(
        jax.random.PRNGKey(0), x
    )["params"]
    assert "bias" not in params_norm["conv"]


def test_double_conv_encoder_mid_channels():
    # encoder path: first conv -> max(out//2, in) channels
    x = jnp.ones((1, 4, 4, 4, 3))
    m = DoubleConv(out_channels=16, encoder=True)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    # mid = max(16 // 2, 3) = 8
    assert params["conv1"]["conv"]["kernel"].shape[-1] == 8
    assert params["conv2"]["conv"]["kernel"].shape[-1] == 16

    # with wide input: mid = max(8//2, 16) = 16
    x = jnp.ones((1, 4, 4, 4, 16))
    m = DoubleConv(out_channels=8, encoder=True)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    assert params["conv1"]["conv"]["kernel"].shape[-1] == 16


def test_double_conv_decoder_channels():
    x = jnp.ones((1, 4, 4, 4, 24))
    m = DoubleConv(out_channels=8, encoder=False)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    assert params["conv1"]["conv"]["kernel"].shape[-1] == 8
    assert params["conv2"]["conv"]["kernel"].shape[-1] == 8


def test_ext_resnet_block_strips_nonlinearity():
    x = jnp.ones((1, 4, 4, 4, 4))
    m = ExtResNetBlock(out_channels=8, order="cge")
    y = init_apply(m, x)
    assert y.shape == (1, 4, 4, 4, 8)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    assert set(params.keys()) == {"conv1", "conv2", "conv3"}


def test_pool3d():
    x = jnp.arange(8.0).reshape(1, 2, 2, 2, 1)
    assert pool3d(x, (2, 2, 2), "max")[0, 0, 0, 0, 0] == 7.0
    assert pool3d(x, (2, 2, 2), "avg")[0, 0, 0, 0, 0] == 3.5


def test_encoder_stage_pools():
    x = jnp.ones((1, 8, 8, 8, 4))
    y = init_apply(EncoderStage(out_channels=8, apply_pooling=True), x)
    assert y.shape == (1, 4, 4, 4, 8)
    y = init_apply(EncoderStage(out_channels=8, apply_pooling=False), x)
    assert y.shape == (1, 8, 8, 8, 8)


def test_decoder_stage_concat_join():
    enc = jnp.ones((1, 8, 8, 8, 4))
    x = jnp.ones((1, 4, 4, 4, 8))
    m = DecoderStage(out_channels=4, block="double")
    variables = m.init(jax.random.PRNGKey(0), enc, x)
    y = m.apply(variables, enc, x)
    assert y.shape == (1, 8, 8, 8, 4)


def test_decoder_stage_sum_join_transpose_geometry():
    # ConvTranspose(k=3, s=2) must exactly double the spatial dims
    # (torch geometry: padding=1, output_padding=1 — components.py:256-264)
    enc = jnp.ones((1, 10, 10, 10, 4))
    x = jnp.ones((1, 5, 5, 5, 8))
    m = DecoderStage(out_channels=4, block="residual", order="cge")
    variables = m.init(jax.random.PRNGKey(0), enc, x)
    y = m.apply(variables, enc, x)
    assert y.shape == (1, 10, 10, 10, 4)


def test_final_conv():
    x = jnp.ones((1, 4, 4, 4, 8))
    y = init_apply(FinalConv(out_channels=3), x)
    assert y.shape == (1, 4, 4, 4, 3)


def test_torch_init_scheme_matches_layer_defaults():
    """init_scheme='torch' reproduces torch's Conv3d kernel AND bias
    distributions: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), +)
    for the kernel and the same bound for the bias (reference models train
    from torch layer defaults)."""
    import numpy as np

    from tpu_mednet.models.blocks import ConvLayer

    m = ConvLayer(out_channels=64, order="cr", init_scheme="torch")
    x = jnp.zeros((1, 8, 8, 8, 16))
    params = m.init(jax.random.PRNGKey(0), x)["params"]["conv"]
    fan_in = 16 * 27
    bound = fan_in ** -0.5
    k = np.asarray(params["kernel"])
    b = np.asarray(params["bias"])
    assert k.shape == (3, 3, 3, 16, 64) and b.shape == (64,)
    for arr in (k, b):
        assert np.abs(arr).max() <= bound + 1e-7
        # uniform, not zeros / not clipped normal: spread fills the range
        assert np.abs(arr).max() > 0.8 * bound
        assert np.abs(arr.mean()) < 0.2 * bound
    # bias must NOT be all zeros (the old kernel-only torch scheme)
    assert np.abs(b).max() > 0

    # lecun scheme keeps flax defaults (zero bias)
    m0 = ConvLayer(out_channels=64, order="cr", init_scheme="lecun")
    p0 = m0.init(jax.random.PRNGKey(0), x)["params"]["conv"]
    assert np.all(np.asarray(p0["bias"]) == 0)


def test_torch_init_transpose_bias_bound():
    """Transposed-conv bias uses torch's dim-1 fan_in (out_ch * k^3)."""
    import numpy as np

    from tpu_mednet.models.blocks import DecoderStage

    m = DecoderStage(out_channels=8, block="residual", init_scheme="torch",
                     num_groups=2)
    enc = jnp.zeros((1, 8, 8, 8, 8))
    xdeep = jnp.zeros((1, 4, 4, 4, 16))
    params = m.init(jax.random.PRNGKey(0), enc, xdeep, train=False)["params"]
    b = np.asarray(params["upsample"]["bias"])
    bound = (8 * 27) ** -0.5
    assert np.abs(b).max() <= bound + 1e-7
    assert np.abs(b).max() > 0
