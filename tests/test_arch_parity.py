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
