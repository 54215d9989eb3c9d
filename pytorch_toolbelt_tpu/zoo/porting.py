"""Pretrained-weight porting: torch state-dicts -> flax parameter pytrees
(SURVEY.md hard part (e): OIHW->HWIO transposes, BN stat mapping).

The converter is mapping-driven: you provide (or auto-derive) a dict from
flax leaf paths to torch state-dict keys; tensors are transposed per kind:

* conv kernel         OIHW  -> HWIO
* depthwise conv      O1HW  -> HWO1 (flax grouped conv layout HWI'O)
* linear kernel       OI    -> IO
* norm scale/bias     copied; running stats -> batch_stats mean/var
"""

from typing import Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "convert_torch_tensor",
    "port_torch_state_dict",
    "bn_mapping",
    "conv_mapping",
    "prefix_mapping",
    "mobilenet_v2_mapping",
    "senet_mapping",
    "inception_v4_mapping",
    "wider_resnet_mapping",
    "fpn_decoder_mapping",
    "resize_head_mapping",
]


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def convert_torch_tensor(value, flax_leaf: jnp.ndarray, leaf_name: str) -> np.ndarray:
    """Convert a single torch tensor to the layout of the given flax leaf."""
    value = _to_numpy(value)
    target_shape = tuple(flax_leaf.shape)

    if value.shape == target_shape:
        return value

    if leaf_name == "kernel" and value.ndim == 4:
        # torch conv OIHW -> flax HWIO
        hwio = value.transpose(2, 3, 1, 0)
        if hwio.shape == target_shape:
            return hwio
        # Depthwise ONLY: torch (C*mult, 1, H, W) -> flax (H, W, 1, C*mult) or
        # (H, W, C, mult).  A reshape is a layout-preserving regrouping only
        # when one of the channel extents is 1; for general grouped kernels or
        # ConvTranspose (I, O, kH, kW) a reshape would silently scramble
        # weights, so refuse and make the caller supply an explicit layout.
        depthwise = hwio.shape[2] == 1 or target_shape[2] == 1 or (len(target_shape) == 4 and target_shape[3] == 1)
        if (
            depthwise
            and hwio.shape[:2] == target_shape[:2]
            and hwio.shape[2] * hwio.shape[3] == target_shape[2] * target_shape[3]
        ):
            return hwio.reshape(target_shape)
    if leaf_name == "kernel" and value.ndim == 2:
        io = value.transpose(1, 0)
        if io.shape == target_shape:
            return io

    raise ValueError(
        f"Cannot convert torch tensor of shape {value.shape} to flax leaf '{leaf_name}' of shape {target_shape}"
    )


def port_torch_state_dict(
    variables,
    state_dict: Mapping[str, "object"],
    mapping: Dict[Tuple[str, ...], str],
    strict: bool = True,
):
    """Copy torch weights into a flax variables pytree.

    Args:
        variables: flax variables ({'params': ..., 'batch_stats': ...}).
        state_dict: torch state dict (str -> tensor).
        mapping: {flax_path_tuple: torch_key}; flax paths are the key chains
            inside ``variables`` including the collection, e.g.
            ('params', 'Conv_0', 'kernel') or
            ('batch_stats', 'BatchNorm_0', 'mean').
        strict: raise if a mapped torch key is missing.

    Returns:
        New variables pytree with mapped leaves replaced.
    """
    flat = {
        tuple(str(getattr(k, "key", getattr(k, "idx", k))) for k in path): leaf
        for path, leaf in jax.tree_util.tree_leaves_with_path(variables)
    }

    replacements = {}
    for flax_path, torch_key in mapping.items():
        flax_path = tuple(str(p) for p in flax_path)
        if flax_path not in flat:
            raise KeyError(f"Flax path {flax_path} not found in variables")
        if torch_key not in state_dict:
            if strict:
                raise KeyError(f"Torch key '{torch_key}' not found in state dict")
            continue
        replacements[flax_path] = convert_torch_tensor(
            state_dict[torch_key], flat[flax_path], flax_path[-1]
        )

    def replace(path, leaf):
        key = tuple(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        if key in replacements:
            return jnp.asarray(replacements[key], dtype=leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(replace, variables)


# ---------------------------------------------------------------------------
# Mapping builders for the reference's vendored backbones
# (modules/backbone/{mobilenet,senet,inceptionv4,wider_resnet}.py). These let
# real torch checkpoints drop into our flax encoders and back the
# architecture-fidelity parity tests.
# ---------------------------------------------------------------------------


def conv_mapping(flax_prefix: Tuple[str, ...], torch_prefix: str, bias: bool = False) -> Dict:
    """{flax_path: torch_key} entries for one conv layer."""
    m = {("params",) + flax_prefix + ("kernel",): f"{torch_prefix}.weight"}
    if bias:
        m[("params",) + flax_prefix + ("bias",)] = f"{torch_prefix}.bias"
    return m


def bn_mapping(flax_prefix: Tuple[str, ...], torch_prefix: str) -> Dict:
    """{flax_path: torch_key} entries for one BatchNorm layer (affine +
    running stats)."""
    return {
        ("params",) + flax_prefix + ("scale",): f"{torch_prefix}.weight",
        ("params",) + flax_prefix + ("bias",): f"{torch_prefix}.bias",
        ("batch_stats",) + flax_prefix + ("mean",): f"{torch_prefix}.running_mean",
        ("batch_stats",) + flax_prefix + ("var",): f"{torch_prefix}.running_var",
    }


def prefix_mapping(mapping: Dict[Tuple[str, ...], str], flax_prefix: Tuple[str, ...]) -> Dict:
    """Re-root every flax path of ``mapping`` under ``flax_prefix`` (inserted
    after the collection key, e.g. ('params', *prefix, ...)).  Lets component
    mappings compose into an ``EncoderDecoderModel`` whose children are named
    'encoder' / 'decoder' / 'head'."""
    return {
        (path[0],) + tuple(flax_prefix) + tuple(path[1:]): torch_key
        for path, torch_key in mapping.items()
    }


def fpn_decoder_mapping(num_levels: int, torch_prefix: str = "") -> Dict[Tuple[str, ...], str]:
    """Flax zoo FPNDecoder <- reference FPNDecoder state dict
    (modules/decoders/fpn.py:13-88, default conv1x1/conv3x3 blocks).

    Flax compact naming: laterals are Conv_0..Conv_{n-1} in fine-to-coarse
    order (= torch lateral.{i}); the prediction convs are created while
    walking coarse-to-fine, so flax Conv_{n+j} <-> torch outputs.{j} (torch
    zips outputs against the reversed lateral list, j=0 is the coarsest
    non-context level on both sides)."""
    p = f"{torch_prefix}." if torch_prefix else ""
    m: Dict[Tuple[str, ...], str] = {}
    for i in range(num_levels):
        m.update(conv_mapping((f"Conv_{i}",), f"{p}lateral.{i}", bias=True))
    for j in range(num_levels - 1):
        m.update(conv_mapping((f"Conv_{num_levels + j}",), f"{p}outputs.{j}", bias=True))
    return m


def resize_head_mapping(torch_prefix: str = "") -> Dict[Tuple[str, ...], str]:
    """Flax zoo ResizeHead <- reference ResizeHead (modules/heads/resize.py:11-79):
    a single biased conv ('final')."""
    p = f"{torch_prefix}." if torch_prefix else ""
    return conv_mapping(("Conv_0",), f"{p}final", bias=True)


def mobilenet_v2_mapping() -> Dict[Tuple[str, ...], str]:
    """Flax MobileNetV2Encoder <- vendored torch MobileNetV2 state dict
    (reference modules/backbone/mobilenet.py:18-101)."""
    from .encoders.mobilenet import _V2_CONFIG

    m = {}
    m.update(conv_mapping(("Conv_0",), "layer0.0"))
    m.update(bn_mapping(("BatchNorm_0",), "layer0.1"))
    block = 0
    for layer_index, (t, c, n, s) in enumerate(_V2_CONFIG):
        for i in range(n):
            fp = f"InvertedResidual_{block}"
            tp = f"layer{layer_index + 1}.{i}.conv"
            if t == 1:  # dw, bn, act, pw-linear, bn
                m.update(conv_mapping((fp, "Conv_0"), f"{tp}.0"))
                m.update(bn_mapping((fp, "BatchNorm_0"), f"{tp}.1"))
                m.update(conv_mapping((fp, "Conv_1"), f"{tp}.3"))
                m.update(bn_mapping((fp, "BatchNorm_1"), f"{tp}.4"))
            else:  # pw, bn, act, dw, bn, act, pw-linear, bn
                m.update(conv_mapping((fp, "Conv_0"), f"{tp}.0"))
                m.update(bn_mapping((fp, "BatchNorm_0"), f"{tp}.1"))
                m.update(conv_mapping((fp, "Conv_1"), f"{tp}.3"))
                m.update(bn_mapping((fp, "BatchNorm_1"), f"{tp}.4"))
                m.update(conv_mapping((fp, "Conv_2"), f"{tp}.6"))
                m.update(bn_mapping((fp, "BatchNorm_2"), f"{tp}.7"))
            block += 1
    return m


def senet_mapping(stage_blocks: Tuple[int, ...], input_3x3: bool = False) -> Dict[Tuple[str, ...], str]:
    """Flax SENetEncoder <- vendored torch SENet state dict (reference
    modules/backbone/senet.py:209-356).  Covers the stem, every bottleneck's
    convs/BNs/SE gate, and first-block downsample projections."""
    m = {}
    stem_convs = (1, 2, 3) if input_3x3 else (1,)
    for i in stem_convs:
        m.update(conv_mapping((f"layer0_conv{i}",), f"layer0.conv{i}"))
        m.update(bn_mapping((f"layer0_bn{i}",), f"layer0.bn{i}"))
    for stage, num_blocks in enumerate(stage_blocks, start=1):
        for i in range(num_blocks):
            fp = f"layer{stage}_{i}"
            tp = f"layer{stage}.{i}"
            for c in ("conv1", "conv2", "conv3"):
                m.update(conv_mapping((fp, c), f"{tp}.{c}"))
            for b in ("bn1", "bn2", "bn3"):
                m.update(bn_mapping((fp, b), f"{tp}.{b}"))
            m.update(conv_mapping((fp, "se", "se_fc1"), f"{tp}.se_module.fc1", bias=True))
            m.update(conv_mapping((fp, "se", "se_fc2"), f"{tp}.se_module.fc2", bias=True))
            if i == 0:  # every stage's first block projects the shortcut
                m.update(conv_mapping((fp, "downsample_conv"), f"{tp}.downsample.0"))
                m.update(bn_mapping((fp, "downsample_bn"), f"{tp}.downsample.1"))
    return m


def _convbn_mapping(flax_prefix: Tuple[str, ...], torch_prefix: str) -> Dict:
    """One ConvBN (Conv_0 + BatchNorm_0) <- torch BasicConv2d (conv + bn)."""
    m = conv_mapping(flax_prefix + ("Conv_0",), f"{torch_prefix}.conv")
    m.update(bn_mapping(flax_prefix + ("BatchNorm_0",), f"{torch_prefix}.bn"))
    return m


def inception_v4_mapping(stage_repeats: Tuple[int, int, int] = (4, 7, 3)) -> Dict[Tuple[str, ...], str]:
    """Flax InceptionV4Encoder <- vendored torch InceptionV4 state dict
    (reference modules/backbone/inceptionv4.py:253-285).  ConvBN indices
    follow the encoder's instantiation order; torch keys follow the
    features.N sequential layout (indices shift with ``stage_repeats`` when
    the torch twin is assembled with reduced block counts)."""
    na, nb, nc = stage_repeats
    m = {}

    def cb(flax_idx: int, torch_path: str, outer: Tuple[str, ...] = ()):
        m.update(_convbn_mapping(outer + (f"ConvBN_{flax_idx}",), torch_path))

    # stem convs (features.0-2), mixed_3a conv (features.3)
    cb(0, "features.0")
    cb(1, "features.1")
    cb(2, "features.2")
    cb(3, "features.3.conv")
    # mixed_4a (features.4): branch0 2 convs, branch1 4 convs
    cb(4, "features.4.branch0.0")
    cb(5, "features.4.branch0.1")
    cb(6, "features.4.branch1.0")
    cb(7, "features.4.branch1.1")
    cb(8, "features.4.branch1.2")
    cb(9, "features.4.branch1.3")
    # mixed_5a conv (features.5)
    cb(10, "features.5.conv")

    # Inception-A blocks (features.6..)
    a_branches = ["branch0", "branch1.0", "branch1.1", "branch2.0", "branch2.1", "branch2.2", "branch3.1"]
    for i in range(na):
        for j, b in enumerate(a_branches):
            cb(j, f"features.{6 + i}.{b}", (f"InceptionA_{i}",))
    # Reduction-A
    for j, b in enumerate(["branch0", "branch1.0", "branch1.1", "branch1.2"]):
        cb(j, f"features.{6 + na}.{b}", ("ReductionA_0",))
    # Inception-B x7 (features.11-17)
    b_branches = [
        "branch0",
        "branch1.0", "branch1.1", "branch1.2",
        "branch2.0", "branch2.1", "branch2.2", "branch2.3", "branch2.4",
        "branch3.1",
    ]
    for i in range(nb):
        for j, b in enumerate(b_branches):
            cb(j, f"features.{7 + na + i}.{b}", (f"InceptionB_{i}",))
    # Reduction-B
    for j, b in enumerate(["branch0.0", "branch0.1", "branch1.0", "branch1.1", "branch1.2", "branch1.3"]):
        cb(j, f"features.{7 + na + nb}.{b}", ("ReductionB_0",))
    # Inception-C x3 (features.19-21)
    c_branches = [
        "branch0",
        "branch1_0", "branch1_1a", "branch1_1b",
        "branch2_0", "branch2_1", "branch2_2", "branch2_3a", "branch2_3b",
        "branch3.1",
    ]
    for i in range(nc):
        for j, b in enumerate(c_branches):
            cb(j, f"features.{8 + na + nb + i}.{b}", (f"InceptionC_{i}",))
    return m


def wider_resnet_mapping(structure: Tuple[int, ...], a2: bool = False, dilation: bool = False) -> Dict[Tuple[str, ...], str]:
    """Flax WiderResNetEncoder <- vendored torch WiderResNet/A2 state dict
    (reference modules/backbone/wider_resnet.py:10-285).  ABN norm layers
    live under '<bn>.bn' in the torch keys."""
    from .encoders.wide_resnet import _MODULE_CHANNELS

    m = conv_mapping(("mod1_conv1",), "mod1.conv1")
    in_channels = 64
    for mod_id, num_blocks in enumerate(structure):
        channels = _MODULE_CHANNELS[mod_id]
        for block_id in range(num_blocks):
            if a2 and not dilation:
                stride = 2 if block_id == 0 and 2 <= mod_id <= 4 else 1
            elif a2 and dilation:
                stride = 2 if block_id == 0 and mod_id == 2 else 1
            else:
                stride = 1
            fp = f"mod{mod_id + 2}_block{block_id + 1}"
            tp = f"mod{mod_id + 2}.block{block_id + 1}"
            m.update(bn_mapping((fp, "bn1", ), f"{tp}.bn1.bn"))
            m.update(conv_mapping((fp, "conv1"), f"{tp}.convs.conv1"))
            m.update(bn_mapping((fp, "bn2"), f"{tp}.convs.bn2.bn"))
            m.update(conv_mapping((fp, "conv2"), f"{tp}.convs.conv2"))
            if len(channels) == 3:
                m.update(bn_mapping((fp, "bn3"), f"{tp}.convs.bn3.bn"))
                m.update(conv_mapping((fp, "conv3"), f"{tp}.convs.conv3"))
            if stride != 1 or in_channels != channels[-1]:
                m.update(conv_mapping((fp, "proj_conv"), f"{tp}.proj_conv"))
            in_channels = channels[-1]
    return m
