"""Load the reference's torch models on CPU as parity oracles.

The reference's custom ops JIT-compile CUDA at import (`op/__init__.py`),
which fails on CPU — so before importing any reference model we install a
pure-torch `op` stub implementing the same math (upfirdn2d / fused leaky
relu / conv2d_gradfix), matching the reference's own CPU fallbacks
(`op/upfirdn2d.py:365-406`, `op/fused_act.py:216-233`).

ONLY used by tests, as the correctness oracle for weight conversion and
architecture parity (SURVEY.md §4 "reference implementations as oracles").
"""

from __future__ import annotations

import math
import sys
import types

import torch
import torch.nn.functional as F

REF = "/root/reference"


def _upfirdn2d_native(x, kernel, up_x, up_y, down_x, down_y,
                      pad_x0, pad_x1, pad_y0, pad_y1):
    _, c, in_h, in_w = x.shape
    x = x.reshape(-1, in_h, in_w, 1)
    out = x.view(-1, in_h, 1, in_w, 1, 1)
    out = F.pad(out, [0, 0, 0, up_x - 1, 0, 0, 0, up_y - 1])
    out = out.view(-1, in_h * up_y, in_w * up_x, 1)
    out = F.pad(out, [0, 0, max(pad_x0, 0), max(pad_x1, 0),
                      max(pad_y0, 0), max(pad_y1, 0)])
    out = out[:, max(-pad_y0, 0): out.shape[1] - max(-pad_y1, 0),
              max(-pad_x0, 0): out.shape[2] - max(-pad_x1, 0), :]
    out = out.permute(0, 3, 1, 2)
    out = out.reshape([-1, 1, in_h * up_y + pad_y0 + pad_y1,
                       in_w * up_x + pad_x0 + pad_x1])
    w = torch.flip(kernel, [0, 1]).view(1, 1, *kernel.shape)
    out = F.conv2d(out, w)
    kernel_h, kernel_w = kernel.shape
    out = out.reshape(-1, 1,
                      in_h * up_y + pad_y0 + pad_y1 - kernel_h + 1,
                      in_w * up_x + pad_x0 + pad_x1 - kernel_w + 1)
    out = out[:, :, ::down_y, ::down_x]
    out_h = (in_h * up_y + pad_y0 + pad_y1 - kernel_h) // down_y + 1
    out_w = (in_w * up_x + pad_x0 + pad_x1 - kernel_w) // down_x + 1
    return out.view(-1, c, out_h, out_w)


def _upfirdn2d(x, kernel, up=1, down=1, pad=(0, 0)):
    if not isinstance(up, (tuple, list)):
        up = (up, up)
    if not isinstance(down, (tuple, list)):
        down = (down, down)
    if len(pad) == 2:
        pad = (pad[0], pad[1], pad[0], pad[1])
    return _upfirdn2d_native(x, kernel, up[0], up[1], down[0], down[1],
                             pad[0], pad[1], pad[2], pad[3])


def _fused_leaky_relu(x, bias=None, negative_slope=0.2, scale=2 ** 0.5):
    if bias is not None:
        rest = [1] * (x.ndim - 2)
        x = x + bias.view(1, bias.shape[0], *rest)
    return F.leaky_relu(x, negative_slope) * scale


class _FusedLeakyReLU(torch.nn.Module):
    def __init__(self, channel, bias=True, negative_slope=0.2, scale=2 ** 0.5):
        super().__init__()
        self.bias = torch.nn.Parameter(torch.zeros(channel)) if bias else None
        self.negative_slope = negative_slope
        self.scale = scale

    def forward(self, x):
        return _fused_leaky_relu(x, self.bias, self.negative_slope, self.scale)


def install_op_stub():
    """Install fake `op` (and nested) modules before reference imports."""
    if "op" in sys.modules and getattr(sys.modules["op"], "_is_stub", False):
        return
    op = types.ModuleType("op")
    op._is_stub = True
    op.upfirdn2d = _upfirdn2d
    op.FusedLeakyReLU = _FusedLeakyReLU
    op.fused_leaky_relu = _fused_leaky_relu

    gradfix = types.ModuleType("op.conv2d_gradfix")
    gradfix.conv2d = F.conv2d
    gradfix.conv_transpose2d = F.conv_transpose2d

    class _NoWeightGrad:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    gradfix.no_weight_gradients = _NoWeightGrad
    op.conv2d_gradfix = gradfix

    fused_act = types.ModuleType("op.fused_act")
    fused_act.FusedLeakyReLU = _FusedLeakyReLU
    fused_act.fused_leaky_relu = _fused_leaky_relu

    upfirdn_mod = types.ModuleType("op.upfirdn2d")
    upfirdn_mod.upfirdn2d = _upfirdn2d

    sys.modules["op"] = op
    sys.modules["op.conv2d_gradfix"] = gradfix
    sys.modules["op.fused_act"] = fused_act
    sys.modules["op.upfirdn2d"] = upfirdn_mod
    # the e4e copy takes a CPU branch importing *_cpu module names
    sys.modules["op.fused_act_cpu"] = fused_act
    sys.modules["op.upfirdn2d_cpu"] = upfirdn_mod


def add_reference_path():
    if REF not in sys.path:
        sys.path.insert(0, REF)


def load_reference_modules():
    """Returns a namespace of importable reference model modules."""
    install_op_stub()
    add_reference_path()
    import importlib

    ns = types.SimpleNamespace()
    ns.restorenet = importlib.import_module("models.RestoreNet")
    ns.code_diffuser = importlib.import_module("models.CodeDiffuser")
    ns.stylegan2 = importlib.import_module("e4e.models.stylegan2.model")
    ns.psp_encoders = importlib.import_module("e4e.models.encoders.psp_encoders")
    ns.ddpm = importlib.import_module("ldm.ddpm")
    return ns
