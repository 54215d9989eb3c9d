"""Architecture-fidelity parity tests against the reference's VENDORED torch
backbones (the four that import without torchvision:
/root/reference/pytorch_toolbelt/modules/backbone/{mobilenet,senet,
inceptionv4,wider_resnet}.py).

Each test builds the torch module with random init, ports its state dict into
the corresponding flax encoder via zoo/porting.py, and asserts per-stage
feature maps agree — proving the flax architectures compute the same function,
not just the same shapes, and that real pretrained checkpoints would port.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="torch reference implementation unavailable"
)


def _randomize_bn_stats(module, seed=0):
    """Give BatchNorms non-trivial running stats/affine so mapping errors
    can't hide behind identity stats."""
    import torch

    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.uniform_(-0.5, 0.5, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.uniform_(-0.2, 0.2, generator=g)


def _to_nhwc(t) -> np.ndarray:
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _assert_features_close(ours, theirs, names, atol=2e-4):
    assert len(ours) == len(theirs)
    for name, a, b in zip(names, ours, theirs):
        b = _to_nhwc(b)
        a = np.asarray(a)
        assert a.shape == b.shape, f"{name}: shape {a.shape} vs {b.shape}"
        scale = max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(
            a, b, atol=atol * scale, err_msg=f"feature map {name} diverges"
        )


def test_mobilenet_v2_matches_vendored_torch():
    import torch

    from pytorch_toolbelt.modules.backbone.mobilenet import MobileNetV2
    from pytorch_toolbelt_tpu.zoo.encoders.mobilenet import MobileNetV2Encoder
    from pytorch_toolbelt_tpu.zoo.porting import mobilenet_v2_mapping, port_torch_state_dict

    torch.manual_seed(0)
    ref = MobileNetV2().eval()
    _randomize_bn_stats(ref)

    import jax

    enc = MobileNetV2Encoder()
    x = np.random.RandomState(1).rand(2, 96, 96, 3).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = port_torch_state_dict(variables, ref.state_dict(), mobilenet_v2_mapping())
    ours = enc.apply(variables, jnp.asarray(x))

    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        t = ref.layer0(t)
        feats = []
        t = ref.layer1(t)
        feats.append(t)  # 16ch stride 2
        t = ref.layer2(t)
        feats.append(t)  # 24ch stride 4
        t = ref.layer3(t)
        feats.append(t)  # 32ch stride 8
        t = ref.layer4(t)
        t = ref.layer5(t)
        feats.append(t)  # 96ch stride 16
        t = ref.layer6(t)
        t = ref.layer7(t)
        feats.append(t)  # 320ch stride 32

    _assert_features_close(ours, feats, ["s2", "s4", "s8", "s16", "s32"])


def _torch_senet_features(encoder, x):
    """Run the vendored torch SENet stage-wise, snapshotting like our
    encoder (stride-2 stem BEFORE the maxpool, then each stage)."""
    import torch

    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        feats = []
        stem = encoder.layer0[:-1](t)  # exclude the pool
        feats.append(stem)
        t = encoder.layer0[-1](stem)
        for layer in (encoder.layer1, encoder.layer2, encoder.layer3, encoder.layer4):
            t = layer(t)
            feats.append(t)
    return feats


def _senet_pair(preset, stage_blocks=None):
    """Build (torch, flax) SENet twins of one flavor, optionally
    depth-reduced: the three block classes + both stem flavors are what the
    porting must get right; block repeats are identical code, so
    (1, 1, 1, 1) proves the same numerics at a fraction of the XLA compile
    (full presets run under -m slow)."""
    import torch

    from pytorch_toolbelt.modules.backbone import senet as ref_senet
    from pytorch_toolbelt_tpu.zoo.encoders import senet as our_senet

    cfg = {
        # block class, groups, reduction, inplanes, input_3x3, dk, dp, kind, base_width
        "se_resnet50": (ref_senet.SEResNetBottleneck, 1, 16, 64, False, 1, 0, "seresnet", 4),
        "se_resnext50_32x4d": (ref_senet.SEResNeXtBottleneck, 32, 16, 64, False, 1, 0, "seresnext", 4),
        "senet154": (ref_senet.SEBottleneck, 64, 16, 128, True, 3, 1, "senet", 4),
    }[preset]
    block, groups, reduction, inplanes, input_3x3, dk, dpad, kind, base_width = cfg
    full_layers = {"se_resnet50": [3, 4, 6, 3], "se_resnext50_32x4d": [3, 4, 6, 3], "senet154": [3, 8, 36, 3]}[preset]
    layers = list(stage_blocks) if stage_blocks is not None else full_layers

    torch.manual_seed(0)
    ref = ref_senet.SENet(
        block, layers, groups=groups, reduction=reduction, dropout_p=None,
        inplanes=inplanes, input_3x3=input_3x3,
        downsample_kernel_size=dk, downsample_padding=dpad,
    ).eval()
    ours = our_senet.SENetEncoder(
        kind=kind, stage_blocks=tuple(layers), groups=groups, reduction=reduction,
        inplanes=inplanes, input_3x3=input_3x3, downsample_kernel_size=dk,
        base_width=base_width,
    )
    return ref, ours


def _check_senet_parity(ref, ours):
    import jax

    from pytorch_toolbelt_tpu.zoo.porting import port_torch_state_dict, senet_mapping

    _randomize_bn_stats(ref)
    x = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    mapping = senet_mapping(ours.stage_blocks, input_3x3=ours.input_3x3)
    variables = port_torch_state_dict(variables, ref.state_dict(), mapping)
    out = ours.apply(variables, jnp.asarray(x))

    feats = _torch_senet_features(ref, x)
    _assert_features_close(out, feats, ["s2", "s4", "s8", "s16", "s32"])


@pytest.mark.parametrize("preset", ["se_resnet50", "se_resnext50_32x4d", "senet154"])
def test_senet_family_matches_vendored_torch(preset):
    ref, ours = _senet_pair(preset, stage_blocks=(1, 1, 1, 1))
    _check_senet_parity(ref, ours)


@pytest.mark.slow
@pytest.mark.parametrize("preset", ["se_resnet50", "se_resnext50_32x4d", "senet154"])
def test_senet_family_matches_vendored_torch_full(preset):
    ref, ours = _senet_pair(preset)
    _check_senet_parity(ref, ours)


def _check_inception_parity(repeats):
    """Parity vs the vendored torch InceptionV4; ``repeats``=(1,1,1) builds a
    depth-reduced torch twin from the SAME vendored block classes (every
    block type + both reductions still exercised — repeats are identical
    code), the full (4,7,3) preset runs under -m slow."""
    import torch

    from pytorch_toolbelt.modules.backbone import inceptionv4 as ref_mod
    from pytorch_toolbelt_tpu.zoo.encoders.inception import InceptionV4Encoder
    from pytorch_toolbelt_tpu.zoo.porting import inception_v4_mapping, port_torch_state_dict

    torch.manual_seed(0)
    na, nb, nc = repeats
    ref = ref_mod.InceptionV4(num_classes=10).eval()
    if repeats != (4, 7, 3):
        blocks = (
            list(ref.features[0:6])
            + [ref_mod.Inception_A() for _ in range(na)]
            + [ref_mod.Reduction_A()]
            + [ref_mod.Inception_B() for _ in range(nb)]
            + [ref_mod.Reduction_B()]
            + [ref_mod.Inception_C() for _ in range(nc)]
        )
        ref.features = torch.nn.Sequential(*blocks)
        ref = ref.eval()
    _randomize_bn_stats(ref)

    import jax

    enc = InceptionV4Encoder(torch_compat=True, stage_repeats=repeats)
    x = np.random.RandomState(1).rand(1, 160, 160, 3).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = port_torch_state_dict(variables, ref.state_dict(), inception_v4_mapping(repeats))
    ours = enc.apply(variables, jnp.asarray(x))

    bounds = [0, 3, 5, 6 + na, 7 + na + nb, 8 + na + nb + nc]
    # snapshot boundaries: stem / mixed4a / A-stack / B-stack / C-stack ends
    snap = [3, 5, 6 + na, 7 + na + nb, 8 + na + nb + nc]
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        feats = []
        for a, b in zip(bounds[:-1], snap):
            t = ref.features[a:b](t)
            feats.append(t)

    _assert_features_close(ours, feats, ["l0", "l1", "l2", "l3", "l4"])


def test_inception_v4_matches_vendored_torch():
    _check_inception_parity((1, 1, 1))


@pytest.mark.slow
def test_inception_v4_matches_vendored_torch_full():
    _check_inception_parity((4, 7, 3))


@pytest.mark.parametrize("a2", [False, True])
def test_wider_resnet16_matches_vendored_torch(a2):
    import torch

    from pytorch_toolbelt.modules.backbone.wider_resnet import WiderResNet, WiderResNetA2
    from pytorch_toolbelt_tpu.zoo.encoders.wide_resnet import WiderResNetEncoder
    from pytorch_toolbelt_tpu.zoo.porting import port_torch_state_dict, wider_resnet_mapping

    torch.manual_seed(0)
    structure = [1, 1, 1, 1, 1, 1]
    ref = (WiderResNetA2 if a2 else WiderResNet)(structure=structure, classes=0).eval()
    _randomize_bn_stats(ref)

    import jax

    enc = WiderResNetEncoder(structure=tuple(structure), a2=a2)
    x = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = port_torch_state_dict(
        variables, ref.state_dict(), wider_resnet_mapping(tuple(structure), a2=a2)
    )
    ours = enc.apply(variables, jnp.asarray(x))

    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        feats = []
        t = ref.mod1(t)
        feats.append(t)
        t = ref.mod2(ref.pool2(t))
        feats.append(t)
        t = ref.mod3(ref.pool3(t))
        feats.append(t)
        if a2:
            t = ref.mod4(t)
            feats.append(t)
            t = ref.mod5(t)
            feats.append(t)
            t = ref.mod6(t)
            feats.append(t)
        else:
            t = ref.mod4(ref.pool4(t))
            feats.append(t)
            t = ref.mod5(ref.pool5(t))
            feats.append(t)
            t = ref.mod6(ref.pool6(t))
            feats.append(t)
        t = ref.mod7(t)
        feats.append(t)

    _assert_features_close(ours, feats, [f"mod{i}" for i in range(1, 8)])
