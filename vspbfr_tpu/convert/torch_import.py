"""PyTorch checkpoint -> flax params converters.

Loads the three released artifacts (`style_encoder_decoder.pt`,
`code_diffuser.pt`, `restoration_net.pt`; plus `Arcface.pth` and LPIPS
weights) into this framework's parameter pytrees (SURVEY.md §7 steps 2-4).

Design: each converter walks MY param tree (from `module.init`) and derives
the torch key for every leaf via a name-translation function, then fits the
torch tensor to the flax leaf shape (layout transposes: linear (out,in) ->
(in,out); conv OIHW -> HWIO; mod-conv (1,O,I,k,k) -> (k,k,I,O); NCHW
buffers -> NHWC). Walking our tree guarantees completeness — any leaf whose
torch key is missing raises, so a conversion either covers every parameter
or fails loudly.

Equalized-lr parameters stay UNSCALED exactly as stored by torch — both
frameworks apply the 1/sqrt(fan_in) scale at use time (SURVEY.md §7 risk
"weight conversion fidelity").
"""

from __future__ import annotations

import re
from typing import Callable, Mapping

import jax
import numpy as np


# --------------------------------------------------------------------------
# generic machinery
# --------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a torch checkpoint file to a flat {key: ndarray} dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    out = {}
    for k, v in ckpt.items():
        if torch.is_tensor(v):
            out[k] = v.detach().cpu().numpy()
        else:
            out[k] = v
    return out


def sub_state_dict(sd: Mapping[str, np.ndarray], prefix: str) -> dict[str, np.ndarray]:
    """Filter `prefix.` keys and strip the prefix (the reference's `get_keys`,
    `e4e/models/psp.py:13-17`)."""
    p = prefix + "."
    return {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}


def fit_tensor(arr: np.ndarray, shape: tuple[int, ...], key: str) -> np.ndarray:
    """Fit a torch tensor to a flax leaf shape via the known layout maps."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        # torch linear weights are (out, in); flax kernels (in, out). Always
        # transpose — a square matrix would "fit" untransposed otherwise.
        if arr.T.shape == tuple(shape):
            return arr.T
        raise ValueError(f"2D shape mismatch {arr.shape} vs {shape} for {key}")
    if arr.shape == tuple(shape):
        return arr
    if arr.ndim == 4:
        oihw = arr.transpose(2, 3, 1, 0)                        # conv OIHW->HWIO
        if oihw.shape == tuple(shape):
            return oihw
        nchw = arr.transpose(0, 2, 3, 1)                        # buffer NCHW->NHWC
        if nchw.shape == tuple(shape):
            return nchw
    if arr.ndim == 5 and arr.shape[0] == 1:                     # modulated conv
        m = arr[0].transpose(2, 3, 1, 0)
        if m.shape == tuple(shape):
            return m
    if arr.size == int(np.prod(shape)):                         # e.g. (1,3,1,1)->(3,)
        return arr.reshape(shape)
    raise ValueError(f"cannot fit torch tensor {arr.shape} to flax {shape} for {key}")


def convert_tree(flax_params, sd: Mapping[str, np.ndarray],
                 key_fn: Callable[[tuple[str, ...]], str]):
    """Map every leaf of `flax_params` from `sd` using `key_fn`."""
    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    treedef = jax.tree_util.tree_structure(flax_params)
    leaves = []
    for path, leaf in flat:
        names = tuple(p.key for p in path)
        tk = key_fn(names)
        if tk not in sd:
            raise KeyError(f"torch key {tk!r} (for {'/'.join(names)}) missing")
        leaves.append(fit_tensor(sd[tk], leaf.shape, tk).astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _bn(name: str) -> str:
    return {"scale": "weight", "bias": "bias", "mean": "running_mean",
            "var": "running_var"}[name]


def _leaf(name: str) -> str:
    return {"kernel": "weight", "alpha": "weight"}.get(name, name)


def _list_idx(name: str) -> tuple[str, int] | None:
    m = re.fullmatch(r"(\w+?)_(\d+)", name)
    return (m.group(1), int(m.group(2))) if m else None


# --------------------------------------------------------------------------
# per-model key translators
# --------------------------------------------------------------------------

def _style_mlp_key(names: tuple[str, ...]) -> str:
    # style/fc{i}/{weight,bias} -> style.{i+1}.*  (PixelNorm is style.0)
    i = int(names[1][2:])
    return f"style.{i + 1}.{names[2]}"


def _conv_layer_key(prefix: str, names: tuple[str, ...], downsample: bool) -> str:
    # ConvLayer: flax {conv,activate} -> torch Sequential indices
    base = 1 if downsample else 0
    if names[0] == "conv":
        return f"{prefix}.{base}.{_leaf(names[1])}"
    if names[0] == "activate":
        return f"{prefix}.{base + 1}.{names[1]}"
    raise KeyError(names)


def _smart_key(prefix: str, names: tuple[str, ...]) -> str:
    head = names[0]
    if head == "modulation":
        return f"{prefix}.modulation.{names[1]}"
    li = _list_idx(head)
    if li and li[0] == "dilated":
        return f"{prefix}.ModulatedConv2ds.{li[1]}.weight"
    if head == "fusion":
        return _conv_layer_key(f"{prefix}.fusion", names[1:], downsample=False)
    if head == "noise":
        return f"{prefix}.noise.weight"
    if head == "activate":
        return f"{prefix}.activate.bias"
    raise KeyError(names)


def _styled_conv_key(prefix: str, names: tuple[str, ...]) -> str:
    head = names[0]
    if head == "conv":
        if names[1] == "modulation":
            return f"{prefix}.conv.modulation.{names[2]}"
        return f"{prefix}.conv.weight"
    if head == "noise":
        return f"{prefix}.noise.weight"
    if head == "activate":
        return f"{prefix}.activate.bias"
    raise KeyError(names)


def _to_rgb_key(prefix: str, names: tuple[str, ...]) -> str:
    if names[0] == "conv":
        if names[1] == "modulation":
            return f"{prefix}.conv.modulation.{names[2]}"
        return f"{prefix}.conv.weight"
    if names[0] == "bias":
        return f"{prefix}.bias"
    raise KeyError(names)


def _large_conv_key(prefix: str, names: tuple[str, ...]) -> str:
    head = names[0]
    li = _list_idx(head)
    if li and li[0] == "dilated":
        return f"{prefix}.dilated_convs.{li[1]}.{_leaf(names[1])}"
    if head == "fusion":
        return _conv_layer_key(f"{prefix}.fusion", names[1:], downsample=False)
    if head == "activate":
        return f"{prefix}.activate.bias"
    raise KeyError(names)


def _generator_key(names: tuple[str, ...]) -> str:
    head = names[0]
    if head == "style":
        return _style_mlp_key(names)
    if head == "const_input":
        return "input.input"
    if head == "conv1":
        return _styled_conv_key("conv1", names[1:])
    if head == "to_rgb1":
        return _to_rgb_key("to_rgb1", names[1:])
    li = _list_idx(head)
    if li and li[0] == "convs":
        return _styled_conv_key(f"convs.{li[1]}", names[1:])
    if li and li[0] == "to":  # "to_rgbs_{n}" splits as ("to", ...)? handled below
        raise KeyError(names)
    m = re.fullmatch(r"to_rgbs_(\d+)", head)
    if m:
        return _to_rgb_key(f"to_rgbs.{m.group(1)}", names[1:])
    raise KeyError(names)


def _restorenet_key(names: tuple[str, ...]) -> str:
    head = names[0]
    if head == "style":
        return _style_mlp_key(names)
    if head == "conv1":
        return _smart_key("conv1", names[1:])
    if head == "to_rgb1":
        return _to_rgb_key("to_rgb1", names[1:])
    m = re.fullmatch(r"to_rgbs_(\d+)", head)
    if m:
        return _to_rgb_key(f"to_rgbs.{m.group(1)}", names[1:])
    m = re.fullmatch(r"convs_(\d+)", head)
    if m:
        n = int(m.group(1))
        # even = StyledConv (upsample), odd = SMART
        if n % 2 == 0:
            return _styled_conv_key(f"convs.{n}", names[1:])
        return _smart_key(f"convs.{n}", names[1:])
    m = re.fullmatch(r"encoder_convs_(\d+)", head)
    if m:
        n = int(m.group(1))
        # even = SMART, odd = StyledConv_down
        if n % 2 == 0:
            return _smart_key(f"encoder_convs.{n}", names[1:])
        return _styled_conv_key(f"encoder_convs.{n}", names[1:])
    if head == "down_from_big":
        return _large_conv_key("down_from_big", names[1:])
    if head == "final_layer":
        return _large_conv_key("final_layer", names[1:])
    if head == "final_linear":
        return f"final_linear.0.{names[1]}"
    if head == "final_transfer":
        return f"final_transfer.{names[1]}"
    raise KeyError(names)


def _discriminator_key(names: tuple[str, ...], log_size: int) -> str:
    head = names[0]
    if head == "stem":
        return _conv_layer_key("encoder_input_convs", names[1:], False)
    m = re.fullmatch(r"res_(\d+)", head)
    if m:
        n = log_size - int(m.group(1))
        prefix = f"encoder_convs.{n}"
        sub = names[1]
        if sub == "conv1":
            return _conv_layer_key(f"{prefix}.conv1", names[2:], False)
        if sub == "conv2":
            return _conv_layer_key(f"{prefix}.conv2", names[2:], True)
        if sub == "skip":
            return _conv_layer_key(f"{prefix}.skip", names[2:], True)
        raise KeyError(names)
    if head == "final_conv":
        return _conv_layer_key("final_conv", names[1:], False)
    if head == "final_linear0":
        return f"final_linear.0.{names[1]}"
    if head == "final_linear1":
        return f"final_linear.1.{names[1]}"
    raise KeyError(names)


def _e4e_key(names: tuple[str, ...]) -> str:
    head = names[0]
    if head == "input_conv":
        return "input_layer.0.weight"
    if head == "input_bn":
        return f"input_layer.1.{_bn(names[1])}"
    if head == "input_prelu":
        return "input_layer.2.weight"
    m = re.fullmatch(r"body_(\d+)", head)
    if m:
        p = f"body.{m.group(1)}"
        sub = names[1]
        table = {
            "shortcut_conv": f"{p}.shortcut_layer.0.weight",
            "bn1": f"{p}.res_layer.0",
            "conv1": f"{p}.res_layer.1.weight",
            "prelu": f"{p}.res_layer.2.weight",
            "conv2": f"{p}.res_layer.3.weight",
            "bn2": f"{p}.res_layer.4",
        }
        if sub == "shortcut_bn":
            return f"{p}.shortcut_layer.1.{_bn(names[2])}"
        if sub in ("bn1", "bn2"):
            return f"{table[sub]}.{_bn(names[2])}"
        if sub == "se":
            return f"{p}.res_layer.5.{names[2]}.weight"
        return table[sub]
    m = re.fullmatch(r"style_(\d+)", head)
    if m:
        p = f"styles.{m.group(1)}"
        sub = names[1]
        mc = re.fullmatch(r"conv(\d+)", sub)
        if mc:
            return f"{p}.convs.{2 * int(mc.group(1))}.{_leaf(names[2])}"
        if sub == "linear":
            return f"{p}.linear.{names[2]}"
        raise KeyError(names)
    if head in ("latlayer1", "latlayer2"):
        return f"{head}.{_leaf(names[1])}"
    raise KeyError(names)


def _code_diffuser_key(names: tuple[str, ...]) -> str:
    m = re.fullmatch(r"block_(\d+)", names[0])
    if not m:
        raise KeyError(names)
    p = f"att_mapper.{m.group(1)}"
    sub = names[1]
    if sub in ("q", "k", "v"):
        return f"{p}.{sub}_matrix.weight"
    if sub == "attention_layer":
        return f"{p}.attention_layer.{names[2]}_matrix.weight"
    m2 = re.fullmatch(r"(gamma|beta)_(fc0|ln|fc1)", sub)
    if m2:
        idx = {"fc0": 0, "ln": 1, "fc1": 3}[m2.group(2)]
        leaf = {"kernel": "weight", "scale": "weight"}.get(names[2], names[2])
        return f"{p}.{m2.group(1)}_.{idx}.{leaf}"
    raise KeyError(names)


def _resnet101_key(names: tuple[str, ...]) -> str:
    head = names[0]
    if head == "stem_conv":
        return "conv1.weight"
    if head == "stem_bn":
        return f"bn1.{_bn(names[1])}"
    if head == "fc":
        return f"fc.{_leaf(names[1])}"
    m = re.fullmatch(r"layer(\d+)_(\d+)", head)
    if m:
        p = f"layer{m.group(1)}.{m.group(2)}"
        sub = names[1]
        if sub == "down_conv":
            return f"{p}.downsample.0.weight"
        if sub == "down_bn":
            return f"{p}.downsample.1.{_bn(names[2])}"
        if sub.startswith("bn"):
            return f"{p}.{sub}.{_bn(names[2])}"
        return f"{p}.{sub}.weight"
    raise KeyError(names)


# torchvision vgg16.features conv indices per my (block, conv) layout
_VGG_IDX = {(0, 0): 0, (0, 1): 2, (1, 0): 5, (1, 1): 7,
            (2, 0): 10, (2, 1): 12, (2, 2): 14,
            (3, 0): 17, (3, 1): 19, (3, 2): 21,
            (4, 0): 24, (4, 1): 26, (4, 2): 28}


def _lpips_key(names: tuple[str, ...]) -> str:
    if names[0] == "vgg":
        m = re.fullmatch(r"conv(\d)_(\d)", names[1])
        return f"features.{_VGG_IDX[(int(m.group(1)), int(m.group(2)))]}.{_leaf(names[2])}"
    m = re.fullmatch(r"lin(\d)", names[0])
    if m:
        return f"lin{m.group(1)}.model.1.weight"
    raise KeyError(names)


# --------------------------------------------------------------------------
# public converters
# --------------------------------------------------------------------------

def _nchw_flat_in(w: np.ndarray, c: int, h: int, wd: int) -> np.ndarray:
    """Linear weight whose INPUT was a torch NCHW flatten -> reorder for the
    NHWC flatten used here. w: torch (out, c*h*w) -> flax (h*w*c, out)."""
    out = w.shape[0]
    return w.reshape(out, c, h, wd).transpose(0, 2, 3, 1).reshape(out, -1).T


def _nchw_flat_out(w: np.ndarray, b: np.ndarray, c: int, h: int, wd: int):
    """Linear whose OUTPUT is reshaped to torch (B,C,H,W); here (B,H,W,C)."""
    w2 = w.reshape(c, h, wd, -1).transpose(1, 2, 0, 3).reshape(c * h * wd, -1)
    b2 = b.reshape(c, h, wd).transpose(1, 2, 0).reshape(-1)
    return w2.T, b2


def convert_stylegan2_generator(flax_params, sd):
    return convert_tree(flax_params, sd, _generator_key)


def convert_restoration_net(flax_params, sd):
    params = convert_tree(flax_params, sd, _restorenet_key)
    # encoder head crosses a flatten boundary (`models/RestoreNet.py:937-941`):
    # final_linear consumes the NCHW-flattened 4x4 map, final_transfer's
    # output is viewed back to (B, C, 4, 4)
    ch4 = params["final_transfer"]["bias"].shape[0] // 16
    params["final_linear"]["weight"] = _nchw_flat_in(
        np.asarray(sd["final_linear.0.weight"]), ch4, 4, 4
    ).astype(params["final_linear"]["weight"].dtype)
    w2, b2 = _nchw_flat_out(np.asarray(sd["final_transfer.weight"]),
                            np.asarray(sd["final_transfer.bias"]), ch4, 4, 4)
    params["final_transfer"]["weight"] = w2.astype(
        params["final_transfer"]["weight"].dtype)
    params["final_transfer"]["bias"] = b2.astype(
        params["final_transfer"]["bias"].dtype)
    return params


def convert_discriminator(flax_params, sd, size: int = 512):
    import math
    log_size = int(math.log2(size))
    params = convert_tree(flax_params, sd,
                          lambda n: _discriminator_key(n, log_size))
    # final_linear.0 consumes the NCHW-flattened 4x4 map (`models/RestoreNet.py:1259-1262`)
    ch4 = params["final_linear0"]["bias"].shape[0]
    params["final_linear0"]["weight"] = _nchw_flat_in(
        np.asarray(sd["final_linear.0.weight"]), ch4, 4, 4
    ).astype(params["final_linear0"]["weight"].dtype)
    return params


def convert_e4e_encoder(flax_params, sd):
    return convert_tree(flax_params, sd, _e4e_key)


def convert_code_diffuser(flax_params, sd):
    return convert_tree(flax_params, sd, _code_diffuser_key)


def convert_resnet101(flax_params, sd):
    return convert_tree(flax_params, sd, _resnet101_key)


def _inception_key(names: tuple[str, ...]) -> str:
    # names: (Mixed_5b, branch1x1, conv|bn, leaf) or (Conv2d_1a_3x3, conv|bn, leaf)
    *mods, sub, leaf = names
    prefix = ".".join(mods)
    if sub == "conv":
        return f"{prefix}.conv.weight"
    return f"{prefix}.bn.{_bn(leaf)}"


def convert_inception_v3(flax_params, sd):
    """torchvision inception_v3 state_dict -> InceptionV3Features params
    (fc / AuxLogits entries in the torch dict are simply unused)."""
    return convert_tree(flax_params, sd, _inception_key)


def convert_lpips(flax_params, vgg_features_sd, lin_sd):
    """vgg_features_sd: torchvision vgg16 state_dict (features.*);
    lin_sd: the calibrated lin heads (`my_lpips/weights/v0.1/vgg.pth`)."""
    sd = dict(vgg_features_sd)
    sd.update(lin_sd)
    return convert_tree(flax_params, sd, _lpips_key)


def convert_psp_checkpoint(psp_facade, flax_params, ckpt_path: str):
    """Convert the full `style_encoder_decoder.pt` (encoder + decoder +
    latent_avg) into a PSPFacade params dict (`e4e/models/psp.py:122-143`)."""
    sd = load_torch_state_dict(ckpt_path)
    enc = convert_e4e_encoder(flax_params["encoder"], sub_state_dict(sd, "encoder"))
    dec = convert_stylegan2_generator(flax_params["decoder"],
                                      sub_state_dict(sd, "decoder"))
    latent_avg = np.asarray(sd["latent_avg"])
    if latent_avg.ndim == 1:
        latent_avg = np.tile(latent_avg[None], (psp_facade.n_latent, 1))
    return {"encoder": enc, "decoder": dec,
            "latent_avg": latent_avg.astype(np.float32)}
