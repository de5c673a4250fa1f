"""Cross-layout parity: models with packed_min_res enabled must reproduce
the unpacked models bit-closely (same params, explicit noise)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vspbfr_tpu.models.restorenet import RestorationNet
from vspbfr_tpu.models.stylegan2 import Generator, channel_dict


pytestmark = [pytest.mark.slow]

def _noise_list(key, b, log_size):
    """Unpacked per-layer noise maps matching the decoder ladder."""
    noises = [jax.random.normal(jax.random.fold_in(key, 0), (b, 4, 4, 1))]
    idx = 1
    for i in range(3, log_size + 1):
        r = 2 ** i
        for _ in range(2):
            noises.append(jax.random.normal(jax.random.fold_in(key, idx),
                                            (b, r, r, 1)))
            idx += 1
    return noises


def test_styledconv_packed_noise_parity():
    """Nonzero noise weight + explicit noise through the packed layout
    (model-level init has zero noise weights, which would mask bugs)."""
    from vspbfr_tpu.models.layers import StyledConv
    from vspbfr_tpu.ops.packed import depth_to_space, space_to_depth

    b, r, c = 2, 16, 8
    x = jax.random.normal(jax.random.key(0), (b, r, r, 2 * c))
    s = jax.random.normal(jax.random.key(1), (b, 512))
    noise = jax.random.normal(jax.random.key(2), (b, 2 * r, 2 * r, 1))

    ref = StyledConv(c, upsample=True)
    pk = StyledConv(c, upsample=True, packed_out=True)
    params = ref.init({"params": jax.random.key(3),
                       "noise": jax.random.key(4)}, x, s)["params"]
    params = jax.tree.map(lambda v: v, params)
    params["noise"]["weight"] = jnp.ones_like(params["noise"]["weight"]) * 0.7

    out_ref = ref.apply({"params": params}, x, s, noise=noise)
    out_pk = pk.apply({"params": params}, x, s, noise=noise)
    np.testing.assert_allclose(depth_to_space(out_pk), out_ref,
                               rtol=1e-4, atol=1e-5)

    # packed-in variant
    pk2 = StyledConv(c, upsample=True, packed_in=True, packed_out=True)
    out_pk2 = pk2.apply({"params": params}, space_to_depth(x), s, noise=noise)
    np.testing.assert_allclose(depth_to_space(out_pk2), out_ref,
                               rtol=1e-4, atol=1e-5)


def test_generator_packed_parity():
    size, b = 64, 2
    g_ref = Generator(size=size, packed_min_res=0)
    g_pk = Generator(size=size, packed_min_res=16)

    key = jax.random.key(0)
    lat = jax.random.normal(jax.random.key(1), (b, g_ref.n_latent, 512))
    noise = _noise_list(jax.random.key(2), b, g_ref.log_size)

    params = g_ref.init({"params": key, "noise": key}, lat, noise=noise)["params"]

    img_ref, feats_ref = g_ref.apply({"params": params}, lat, noise=noise,
                                     return_features=True)
    img_pk, feats_pk = g_pk.apply({"params": params}, lat, noise=noise,
                                  return_features=True)

    np.testing.assert_allclose(img_pk, img_ref, rtol=1e-4, atol=1e-4)
    # features at packed resolutions come back packed; unpack to compare
    from vspbfr_tpu.ops.packed import depth_to_space
    assert len(feats_pk) == len(feats_ref)
    for fr, fp in zip(feats_ref, feats_pk):
        if fp.shape != fr.shape:
            fp = depth_to_space(fp)
        np.testing.assert_allclose(fp, fr, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("pmr_div", [1, 4])
def test_restorenet_packed_parity(pmr_div):
    """pmr_div=1: only the top resolution packed (round-1 behavior);
    pmr_div=4: packing two levels down, exercising the packed->packed
    encoder downsample (blur_down_conv_packed_packed) and packed SMART /
    fusion at the inner resolutions."""
    size, b = 64, 2
    pmr = size // pmr_div
    net_ref = RestorationNet(size=size, packed_min_res=0)
    net_pk = RestorationNet(size=size, packed_min_res=pmr)

    key = jax.random.key(3)
    imgs = jax.random.uniform(jax.random.key(4), (b, size, size, 3),
                              minval=-1, maxval=1)
    pre = jax.random.normal(jax.random.key(5), (b, net_ref.n_latent, 512))
    nz = jax.random.normal(jax.random.key(6), (1, b, 512))
    # rng-driven noise: the packed layout draws the identical stream (the
    # encoder's reversed noise indexing only supports randomized noise —
    # explicit buffers would be shape-mismatched, as in the reference)
    noise_rng = jax.random.key(7)

    ch = channel_dict(2)
    feats = [jax.random.normal(jax.random.fold_in(key, 100), (b, 4, 4, ch[4]))]
    for i in range(3, net_ref.log_size + 1):
        r = 2 ** i
        feats.append(jax.random.normal(jax.random.fold_in(key, 100 + i),
                                       (b, r, r, ch[r])) * 0.2)

    params = net_ref.init({"params": key, "noise": key},
                          imgs, feats, pre, nz)["params"]

    # the packed net expects decoder features at packed resolutions in the
    # packed layout (as the packed Generator produces them)
    from vspbfr_tpu.ops.packed import space_to_depth
    feats_pk = [space_to_depth(f) if f.shape[1] >= pmr else f for f in feats]

    out_ref = net_ref.apply({"params": params}, imgs, feats, pre, nz,
                            deterministic=True, rngs={"noise": noise_rng})
    out_pk = net_pk.apply({"params": params}, imgs, feats_pk, pre, nz,
                          deterministic=True, rngs={"noise": noise_rng})
    np.testing.assert_allclose(out_pk, out_ref, rtol=1e-4, atol=1e-4)


def test_psp_facade_pooled_from_packed():
    """face_pool(d2s(packed_rgb)) == phase-mean on the packed RGB: the
    PSPFacade pooled fast path (decode/decode_with_feats with resize=True,
    out_size == size/2) must match the explicit d2s + adaptive_avg_pool."""
    from vspbfr_tpu.models.psp import PSPFacade, adaptive_avg_pool
    from vspbfr_tpu.ops.packed import depth_to_space

    size, b = 64, 2
    pipe = PSPFacade.create(out_size=size // 2, size=size,
                            packed_min_res=16)
    assert pipe._pooled_from_packed()
    # init only the decoder — decode paths never touch the (heavy) encoder
    dec = pipe.decoder.init(
        {"params": jax.random.key(0), "noise": jax.random.key(5)},
        jnp.zeros((1, pipe.n_latent, 512)))["params"]
    params = {"decoder": dec}
    codes = jax.random.normal(jax.random.key(1), (b, pipe.n_latent, 512))
    noise = _noise_list(jax.random.key(2), b, pipe.decoder.log_size)

    img, feats = pipe.decode_with_feats(params, codes, noise=noise)
    packed, _ = pipe.decoder.apply({"params": params["decoder"]}, codes,
                                   noise=noise, return_packed_rgb=True)
    ref = adaptive_avg_pool(depth_to_space(packed), (size // 2, size // 2))
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    assert img.shape == (b, size // 2, size // 2, 3)

    img2 = pipe.decode(params, codes, noise=noise)
    np.testing.assert_allclose(np.asarray(img2), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
