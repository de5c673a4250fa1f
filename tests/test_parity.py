"""Architecture + converter parity vs the reference torch models (CPU oracle).

Random-weight reference modules are exported via state_dict, converted with
vspbfr_tpu.convert, and outputs compared with identical inputs/noise
(SURVEY.md §4: "module-level parity tests vs converted reference
checkpoints"; randomness injected explicitly per §7 "randomness parity").
"""

import math
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, ".")  # tests/ package-less import
from tests.torch_oracle import load_reference_modules  # noqa: E402

from vspbfr_tpu.convert import (  # noqa: E402
    convert_code_diffuser,
    convert_discriminator,
    convert_e4e_encoder,
    convert_restoration_net,
    convert_stylegan2_generator,
)
from vspbfr_tpu.diffusion import DDPMSchedule, LatentDDPM  # noqa: E402
from vspbfr_tpu.models.code_diffuser import CodeDiffuser  # noqa: E402
from vspbfr_tpu.models.e4e import Encoder4Editing  # noqa: E402
from vspbfr_tpu.models.restorenet import Discriminator, RestorationNet  # noqa: E402
from vspbfr_tpu.models.stylegan2 import Generator, channel_dict  # noqa: E402


pytestmark = [pytest.mark.parity, pytest.mark.slow]

@pytest.fixture(scope="module")
def ref():
    return load_reference_modules()


def randomize_(module: "torch.nn.Module", seed: int = 0, scale: float = 0.5):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)
        # only BN running stats; blur kernels / registered noises are
        # structural constants and must keep their defaults
        for name, b in module.named_buffers():
            if "running_var" in name:
                b.copy_(torch.rand(b.shape, generator=g) + 0.5)
            elif "running_mean" in name:
                b.copy_(torch.randn(b.shape, generator=g) * 0.5)


def sd_numpy(module) -> dict:
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def nhwc(x: "torch.Tensor") -> np.ndarray:
    return x.detach().numpy().transpose(0, 2, 3, 1)


# --------------------------------------------------------------------------

def test_code_diffuser_parity(ref, rng):
    tmodel = ref.code_diffuser.Code_diffuser(timesteps=4).eval()
    randomize_(tmodel)
    x = rng.standard_normal((2, 18, 512)).astype(np.float32)
    c = rng.standard_normal((2, 18, 512)).astype(np.float32)
    with torch.no_grad():
        out_t = tmodel(torch.from_numpy(x), torch.from_numpy(c),
                       torch.tensor([2, 2])).numpy()

    model = CodeDiffuser(timesteps=4)
    params0 = model.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(c),
                         jnp.zeros((2,), jnp.int32))["params"]
    params = convert_code_diffuser(params0, sd_numpy(tmodel))
    out_j = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(c),
                        jnp.full((2,), 2, jnp.int32))
    np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=2e-4, atol=2e-4)


def test_ddpm_sampler_parity(ref, rng):
    """Schedule + deterministic 4-step reverse chain, eval and train modes."""
    tden = ref.code_diffuser.Code_diffuser(timesteps=4).eval()
    randomize_(tden)
    tddpm = ref.ddpm.My_DDPM(denoise=tden, linear_start=0.1, linear_end=0.99,
                             timesteps=4).eval()

    model = CodeDiffuser(timesteps=4)
    x = rng.standard_normal((2, 18, 512)).astype(np.float32)
    params0 = model.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(x),
                         jnp.zeros((2,), jnp.int32))["params"]
    params = convert_code_diffuser(params0, sd_numpy(tden))
    jddpm = LatentDDPM(
        lambda a, c, t: model.apply({"params": params}, a, c, t),
        DDPMSchedule.linear(4, 0.1, 0.99))

    # schedule buffers match
    np.testing.assert_allclose(jddpm.sched.betas,
                               tddpm.betas.numpy(), rtol=1e-6)
    np.testing.assert_allclose(jddpm.sched.posterior_mean_coef1,
                               tddpm.posterior_mean_coef1.numpy(), rtol=1e-5)

    cond = rng.standard_normal((2, 18, 512)).astype(np.float32)
    noise = rng.standard_normal((2, 18, 512)).astype(np.float32)

    # eval: start from the same noise; torch loop vs jax loop
    with torch.no_grad():
        xt = torch.from_numpy(noise)
        ct = torch.from_numpy(cond)
        for t in reversed(range(4)):
            xt, _ = tddpm.p_sample(xt, torch.full((2,), t, dtype=torch.long),
                                   ct, clip_denoised=False)
    out_j = jddpm.sample(jnp.asarray(cond), jnp.asarray(noise))
    # random (untrained) weights make the chained softmaxes razor-peaked, so
    # a handful of elements amplify fp noise; assert on the error tail
    # (single-call parity above is 2e-4-tight)
    err = np.abs(np.asarray(out_j) - xt.numpy())
    assert np.quantile(err, 0.999) < 2e-3 and err.max() < 0.1

    # train: full chain parity incl. q_sample at t=T-1
    with torch.no_grad():
        final_t, chain_t = tddpm(torch.from_numpy(x), torch.from_numpy(cond),
                                 training=True)
    # torch draws its own q_sample noise internally; replicate by calling
    # q_sample explicitly with our noise instead
    with torch.no_grad():
        xt = tddpm.q_sample(torch.from_numpy(x),
                            torch.full((2,), 3, dtype=torch.long),
                            noise=torch.from_numpy(noise))
        ct = torch.from_numpy(cond)
        for t in reversed(range(4)):
            xt, _ = tddpm.p_sample(xt, torch.full((2,), t, dtype=torch.long),
                                   ct, clip_denoised=False)
    final_j, chain_j = jddpm.training_chain(jnp.asarray(x), jnp.asarray(cond),
                                            jnp.asarray(noise))
    assert len(chain_j) == len(chain_t)
    err = np.abs(np.asarray(final_j) - xt.numpy())
    scale = np.std(xt.numpy())
    assert err.mean() < 1e-3 * scale and err.max() < 0.05 * scale


def _noise_lists(rng, num_layers, start_res=4, batch=1):
    """Matched torch/jax per-layer noise: layer l at res 2^((l+5)//2)."""
    tns, jns = [], []
    for l in range(num_layers):
        r = 2 ** ((l + 5) // 2)
        n = rng.standard_normal((batch, 1, r, r)).astype(np.float32)
        tns.append(torch.from_numpy(n))
        jns.append(jnp.asarray(n.transpose(0, 2, 3, 1)))
    return tns, jns


def test_stylegan2_generator_parity(ref, rng):
    size = 64
    tg = ref.stylegan2.Generator(size, 512, 8, channel_multiplier=2).eval()
    randomize_(tg)

    g = Generator(size=size)
    lat = rng.standard_normal((2, g.n_latent, 512)).astype(np.float32)
    tns, jns = _noise_lists(rng, g.num_layers, batch=2)

    with torch.no_grad():
        img_t, feats_t = tg([torch.from_numpy(lat)], input_is_latent=True,
                            noise=tns, return_features=True)

    params0 = g.init({"params": jax.random.key(0), "noise": jax.random.key(1)},
                     jnp.asarray(lat))["params"]
    params = convert_stylegan2_generator(params0, sd_numpy(tg))
    img_j, feats_j = g.apply({"params": params}, jnp.asarray(lat), noise=jns,
                             return_features=True)

    assert len(feats_j) == len(feats_t)
    np.testing.assert_allclose(np.asarray(img_j), nhwc(img_t),
                               rtol=5e-3, atol=2e-3)
    for fj, ft in zip(feats_j, feats_t):
        np.testing.assert_allclose(np.asarray(fj), nhwc(ft),
                                   rtol=1e-3, atol=2e-3)


def test_e4e_encoder_parity(ref, rng):
    opts = types.SimpleNamespace(stylegan_size=1024, input_channel=3)
    te = ref.psp_encoders.Encoder4Editing(50, "ir_se", opts).eval()
    randomize_(te)

    x = (rng.standard_normal((1, 3, 256, 256)) * 0.3).astype(np.float32)
    with torch.no_grad():
        w_t = te(torch.from_numpy(x)).numpy()

    enc = Encoder4Editing(stylegan_size=1024)
    params0 = enc.init(jax.random.key(0),
                       jnp.zeros((1, 256, 256, 3)))["params"]
    params = convert_e4e_encoder(params0, sd_numpy(te))
    w_j = enc.apply({"params": params},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(w_j), w_t, rtol=2e-3, atol=2e-3)


def test_restoration_net_parity(ref, rng):
    size = 64
    tnet = ref.restorenet.Restoration_net(size, 512, 8,
                                          channel_multiplier=2).eval()
    randomize_(tnet)
    # The reference's explicit-noise path is latent dead code (the reversed
    # noise list mis-aligns resolutions after each downsample; live code
    # always uses randomize_noise=True). Zero the NoiseInjection gains and
    # let both sides draw their own noise — contributions vanish, outputs
    # stay comparable.
    with torch.no_grad():
        for name, p in tnet.named_parameters():
            if name.endswith("noise.weight"):
                p.zero_()

    net = RestorationNet(size=size)
    b = 2
    ch = channel_dict()
    imgs = (rng.standard_normal((b, 3, size, size)) * 0.3).astype(np.float32)
    pre = rng.standard_normal((b, 18, 512)).astype(np.float32)
    z = rng.standard_normal((b, 512)).astype(np.float32)
    n_feats = int(math.log2(size)) - 1
    de_feats_t = [
        torch.from_numpy(rng.standard_normal(
            (b, ch[2 ** (f + 2)], 2 ** (f + 2), 2 ** (f + 2))
        ).astype(np.float32) * 0.3)
        for f in range(n_feats)
    ]
    de_feats_j = [jnp.asarray(t.numpy().transpose(0, 2, 3, 1))
                  for t in de_feats_t]
    with torch.no_grad():
        out_t = tnet(torch.from_numpy(imgs), de_feats_t,
                     torch.from_numpy(pre), [torch.from_numpy(z)])

    params0 = net.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.asarray(imgs.transpose(0, 2, 3, 1)), de_feats_j,
        jnp.asarray(pre), jnp.asarray(z[None]))["params"]
    params = convert_restoration_net(params0, sd_numpy(tnet))
    out_j = net.apply({"params": params},
                      jnp.asarray(imgs.transpose(0, 2, 3, 1)), de_feats_j,
                      jnp.asarray(pre), jnp.asarray(z[None]),
                      deterministic=True, rngs={"noise": jax.random.key(2)})
    np.testing.assert_allclose(np.asarray(out_j), nhwc(out_t),
                               rtol=2e-3, atol=2e-3)


def test_discriminator_parity(ref, rng):
    size = 64
    td = ref.restorenet.Discriminator(size, channel_multiplier=2).eval()
    randomize_(td)
    x = (rng.standard_normal((4, 3, size, size)) * 0.3).astype(np.float32)
    with torch.no_grad():
        out_t = td(torch.from_numpy(x)).numpy()

    d = Discriminator(size=size)
    params0 = d.init(jax.random.key(0),
                     jnp.zeros((4, size, size, 3)))["params"]
    params = convert_discriminator(params0, sd_numpy(td), size=size)
    out_j = d.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=2e-3, atol=2e-3)
