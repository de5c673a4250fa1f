"""Shape/structure tests for the model zoo (tiny configs where possible)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vspbfr_tpu.diffusion import DDPMSchedule, LatentDDPM
from vspbfr_tpu.models.code_diffuser import CodeDiffuser
from vspbfr_tpu.models.e4e import Encoder4Editing, resize_bilinear_align_corners
from vspbfr_tpu.models.layers import (
    EqualLinear,
    SMARTLayer,
    StyledConv,
    StyleMLP,
    minibatch_stddev,
    styles_to_latent,
)
from vspbfr_tpu.models.restorenet import Discriminator, RestorationNet
from vspbfr_tpu.models.stylegan2 import Generator


def keys(n, seed=0):
    return jax.random.split(jax.random.key(seed), n)


def test_equal_linear_scaling():
    """Stored params unscaled; output = x @ (W/lr_mul-init * scale)."""
    m = EqualLinear(8, lr_mul=0.01)
    x = jnp.ones((2, 4))
    params = m.init(jax.random.key(0), x)["params"]
    # init stddev should be 1/lr_mul = 100
    assert 50 < float(jnp.std(params["weight"])) < 200


def test_style_mlp():
    m = StyleMLP()
    z = jax.random.normal(jax.random.key(1), (3, 512))
    params = m.init(jax.random.key(0), z)["params"]
    w = m.apply({"params": params}, z)
    assert w.shape == (3, 512)


def test_styles_to_latent_mixing():
    s = jnp.stack([jnp.ones((2, 4)), 2 * jnp.ones((2, 4))])
    lat = styles_to_latent(s, 6, inject_index=2)
    assert lat.shape == (2, 6, 4)
    np.testing.assert_array_equal(np.asarray(lat[:, :2]), 1.0)
    np.testing.assert_array_equal(np.asarray(lat[:, 2:]), 2.0)


def test_smart_layer_shapes():
    m = SMARTLayer(features=32)
    x = jnp.ones((2, 8, 8, 16))
    style = jnp.ones((2, 64))
    params = m.init({"params": jax.random.key(0), "noise": jax.random.key(1)},
                    x, style)["params"]
    out = m.apply({"params": params}, x, style, rngs={"noise": jax.random.key(2)})
    assert out.shape == (2, 8, 8, 32)
    up = SMARTLayer(features=32, upsample=True)
    params = up.init({"params": jax.random.key(0), "noise": jax.random.key(1)},
                     x, style)["params"]
    out = up.apply({"params": params}, x, style, rngs={"noise": jax.random.key(2)})
    assert out.shape == (2, 16, 16, 32)


def test_styled_conv_down():
    m = StyledConv(24, downsample=True)
    x = jnp.ones((2, 16, 16, 12))
    style = jnp.ones((2, 64))
    params = m.init({"params": jax.random.key(0), "noise": jax.random.key(1)},
                    x, style)["params"]
    out = m.apply({"params": params}, x, style, rngs={"noise": jax.random.key(2)})
    assert out.shape == (2, 8, 8, 24)


def test_generator_64():
    g = Generator(size=64)
    assert g.n_latent == 10 and g.num_layers == 9
    lat = jnp.zeros((2, 10, 512))
    params = g.init({"params": keys(2)[0], "noise": keys(2)[1]}, lat)["params"]
    img, feats = g.apply({"params": params}, lat, return_features=True,
                         rngs={"noise": jax.random.key(3)})
    assert img.shape == (2, 64, 64, 3)
    # features: 4x4 then one per upsample: 8,16,32,64
    assert len(feats) == 5
    assert feats[0].shape == (2, 4, 4, 512)
    assert feats[-1].shape[1] == 64


def test_code_diffuser_and_ddpm():
    m = CodeDiffuser(timesteps=4)
    x = jax.random.normal(jax.random.key(0), (2, 18, 512))
    cond = jax.random.normal(jax.random.key(1), (2, 18, 512))
    t = jnp.zeros((2,), jnp.int32)
    params = m.init(jax.random.key(2), x, cond, t)["params"]
    out = m.apply({"params": params}, x, cond, t)
    assert out.shape == (2, 18, 512)

    sched = DDPMSchedule.linear()
    # schedule values: betas = linspace(sqrt(.1), sqrt(.99), 4)^2
    np.testing.assert_allclose(sched.betas[0], 0.1, rtol=1e-6)
    np.testing.assert_allclose(sched.betas[-1], 0.99, rtol=1e-6)
    assert sched.num_timesteps == 4

    ddpm = LatentDDPM(lambda x, c, t: m.apply({"params": params}, x, c, t))
    noise = jax.random.normal(jax.random.key(3), x.shape)
    out1 = ddpm.sample(cond, noise)
    out2 = ddpm.sample(cond, noise)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))  # Q1: deterministic
    final, chain = ddpm.training_chain(x, cond, noise)
    assert len(chain) == 5
    np.testing.assert_array_equal(np.asarray(final), np.asarray(chain[-1]))


def test_e4e_encoder_tiny():
    """Full IR-SE-50 at 64px input (structure identical, cheaper)."""
    enc = Encoder4Editing(stylegan_size=1024)
    x = jnp.zeros((1, 64, 64, 3))
    params = enc.init(jax.random.key(0), x)["params"]
    w = enc.apply({"params": params}, x)
    assert w.shape == (1, 18, 512)


def test_resize_align_corners_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).standard_normal((1, 5, 7, 3)).astype(np.float32)
    out = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), (10, 14)))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(10, 14),
        mode="bilinear", align_corners=True,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_minibatch_stddev():
    x = jax.random.normal(jax.random.key(0), (4, 4, 4, 8))
    out = minibatch_stddev(x)
    assert out.shape == (4, 4, 4, 9)
    torch = pytest.importorskip("torch")
    xt = torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))
    group, feat = 4, 1
    b, c, h, w = xt.shape
    st = xt.view(group, -1, feat, c // feat, h, w)
    st = torch.sqrt(st.var(0, unbiased=False) + 1e-8)
    st = st.mean([2, 3, 4], keepdims=True).squeeze(2).repeat(group, 1, h, w)
    ref = torch.cat([xt, st], 1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_restoration_net_64():
    """End-to-end RestoreNet at 64px: n_latent=10, 4 decoder scales."""
    net = RestorationNet(size=64)
    assert net.n_latent == 10
    b = 2
    imgs = jnp.zeros((b, 64, 64, 3))
    pre_styles = jnp.zeros((b, 18, 512))
    z = jnp.zeros((1, b, 512))
    # stylegan features at matching channels: index f at res 2^(f+2)
    from vspbfr_tpu.models.stylegan2 import channel_dict
    ch = channel_dict()
    de_feats = [jnp.zeros((b, 2 ** (f + 2), 2 ** (f + 2), ch[2 ** (f + 2)]))
                for f in range(5)]
    params = net.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        imgs, de_feats, pre_styles, z)["params"]
    out = net.apply({"params": params}, imgs, de_feats, pre_styles, z,
                    rngs={"noise": jax.random.key(2)})
    assert out.shape == (b, 64, 64, 3)


def test_discriminator_64():
    d = Discriminator(size=64)
    x = jnp.zeros((4, 64, 64, 3))
    params = d.init(jax.random.key(0), x)["params"]
    out = d.apply({"params": params}, x)
    assert out.shape == (4, 1)
