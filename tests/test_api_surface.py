"""Symbol-level API-parity audit.

AST-parses every module of the torch reference and asserts each public
symbol resolves somewhere in the pytorch_toolbelt_tpu namespace — either
under the same name in a public module, or under its original spelling in
``pytorch_toolbelt_tpu.compat`` (reference-named aliases/adapters).

This is the enforcement for the "a user of the reference finds everything"
claim: any symbol the reference grows (or we lose) fails here by name.
"""

import ast
import importlib
from pathlib import Path

import pytest

REFERENCE_ROOT = Path("/root/reference/pytorch_toolbelt")

OUR_MODULES = [
    "pytorch_toolbelt_tpu",
    "pytorch_toolbelt_tpu.nn",
    "pytorch_toolbelt_tpu.core.interfaces",
    "pytorch_toolbelt_tpu.zoo",
    "pytorch_toolbelt_tpu.losses",
    "pytorch_toolbelt_tpu.losses.functional",
    "pytorch_toolbelt_tpu.inference",
    "pytorch_toolbelt_tpu.inference.functional",
    "pytorch_toolbelt_tpu.inference.tta",
    "pytorch_toolbelt_tpu.datasets",
    "pytorch_toolbelt_tpu.optimization",
    "pytorch_toolbelt_tpu.utils",
    "pytorch_toolbelt_tpu.utils.tensor",
    "pytorch_toolbelt_tpu.utils.fs",
    "pytorch_toolbelt_tpu.utils.visualization",
    "pytorch_toolbelt_tpu.distributed",
    "pytorch_toolbelt_tpu.ops",
    "pytorch_toolbelt_tpu.compat",
]


def _public_symbols(path: Path):
    """Reference module's public names: __all__ when present, else top-level
    def/class names.  Leading-underscore names are private regardless of
    __all__ (the reference exports _take & co. through __all__, but a
    private helper is not API surface)."""
    tree = ast.parse(path.read_text(), filename=str(path))
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for target in node.targets:
                if isinstance(target, ast.Name) and target.id == "__all__":
                    try:
                        return sorted(
                            n for n in set(ast.literal_eval(node.value)) if not n.startswith("_")
                        )
                    except ValueError:
                        pass
    return sorted(
        node.name
        for node in tree.body
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)) and not node.name.startswith("_")
    )


@pytest.fixture(scope="module")
def our_namespace():
    names = set()
    for module_name in OUR_MODULES:
        module = importlib.import_module(module_name)
        names.update(n for n in dir(module) if not n.startswith("_"))
    return names


def test_every_reference_symbol_resolves(our_namespace):
    missing = {}
    total = 0
    for py in sorted(REFERENCE_ROOT.rglob("*.py")):
        symbols = _public_symbols(py)
        total += len(symbols)
        gone = [s for s in symbols if s not in our_namespace]
        if gone:
            missing[str(py.relative_to(REFERENCE_ROOT))] = gone
    assert total > 400  # sanity: the audit actually parsed the reference
    assert not missing, f"reference symbols without a resolvable name ({sum(map(len, missing.values()))}): {missing}"


def test_compat_aliases_all_resolve():
    """Every name in compat.__all__ must import to a real object."""
    compat = importlib.import_module("pytorch_toolbelt_tpu.compat")
    for name in compat.__all__:
        obj = getattr(compat, name)
        assert obj is not None, name


def test_compat_spot_checks():
    """A few aliases exercised for behavior, not just importability."""
    import jax.numpy as jnp
    import numpy as np

    from pytorch_toolbelt_tpu import compat

    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 6, 3).astype(np.float32))
    # torch_rot180 on NHWC: two flips of the spatial axes
    np.testing.assert_allclose(
        np.asarray(compat.torch_rot180(x)), np.asarray(x)[:, ::-1, ::-1, :], rtol=0, atol=0
    )
    # rot90 aliases invert each other
    np.testing.assert_allclose(
        np.asarray(compat.torch_rot270(compat.torch_rot90(x))), np.asarray(x), rtol=0, atol=0
    )
    # activation factory keeps the torch instantiate-then-call shape
    y = compat.Mish()(x)
    assert y.shape == x.shape
    # scheduler alias: the factory builds a callable schedule
    sched = compat.PolyLR(base_lr=0.1, max_epoch=10)
    assert 0.0 < float(sched(0)) <= 0.1
    # encoder class alias -> factory with the same call shape
    enc = compat.Resnet18Encoder()
    spec = enc.get_output_spec()
    assert len(spec.channels) == len(spec.strides)
    # interfaces protocol is runtime-checkable and satisfied structurally
    assert isinstance(enc, compat.HasOutputFeaturesSpecification)


def test_bilinear_upsample_initializer_matches_reference_arithmetic():
    """Radial-tent deconv kernel: same values as reference upsample.py:47-57
    computed here in numpy on an HWIO shape."""
    import jax

    import numpy as np

    from pytorch_toolbelt_tpu.nn import bilinear_upsample_initializer

    h = w = 4
    kernel = np.asarray(
        bilinear_upsample_initializer(jax.random.PRNGKey(0), (h, w, 3, 3), jnp_dtype())
    )
    ci, cj = h // 2, w // 2
    dist = np.hypot(
        ci - np.arange(h)[:, None].astype(np.float32),
        cj - np.arange(w)[None, :].astype(np.float32),
    )
    y = 1.0 - dist / dist.sum()
    y = y / y.sum()
    for i in range(3):
        for o in range(3):
            np.testing.assert_allclose(kernel[:, :, i, o], y, rtol=1e-6)


def jnp_dtype():
    import jax.numpy as jnp

    return jnp.float32


def test_new_small_utilities():
    import numpy as np

    from pytorch_toolbelt_tpu.utils.fs import find_in_dir_glob, has_ext
    from pytorch_toolbelt_tpu.utils.tensor import (
        container_to_tensor,
        int_to_string_human_friendly,
    )

    assert has_ext("a/b/photo.JPG", ".jpg")
    assert has_ext("x.png", [".png", ".jpg"])
    assert not has_ext("x.png", ".jpg")
    with pytest.raises(ValueError):
        has_ext("x.png", 42)
    assert find_in_dir_glob(str(REFERENCE_ROOT / "losses" / "*.py"))  # non-empty, sorted
    assert int_to_string_human_friendly(999) == "999"
    assert int_to_string_human_friendly(1234) == "1.23K"
    assert int_to_string_human_friendly(2_500_000) == "2.50M"
    assert int_to_string_human_friendly(3_000_000_000) == "3.00B"
    out = container_to_tensor({"a": np.zeros((2,)), "b": [np.ones((1,)), "keep"]})
    assert out["b"][1] == "keep"
    assert out["a"].shape == (2,)


# Expected output spec of every encoder-class alias in compat._ALIASES
# (VERDICT r3 #7: the symbol audit proved name resolution, not semantics —
# this table locks each alias's ARCHITECTURE so an alias can never silently
# resolve to a different parameterization than its reference name).
#
# Channel values derive from the reference's own declarations:
#   resnet.py:62-82, seresnet.py:93-123, densenet.py:87-118,
#   mobilenet.py:9,38,64, squeezenet.py:13, inception.py:7-15,
#   wide_resnet.py:21,97, hrnet.py:228-236 (channels = [64, w, 2w, 4w, 8w]),
#   xresnet.py:146-165 (expansion 1 vs 4), swin.py:547 (embed_dim * 2^i),
#   mix_transformer.py:348, timm/efficient_net.py:99-270 (features= lists),
#   timm/dpn.py:22-113, and for the GenericTimmEncoder families
#   (NFNet/NF-RegNet/Res2Net/ResNet-D/SK/SWSL/TResNet/MaxViT) the timm
#   architecture constants the reference discovers at runtime.
# Where our NHWC design documents a different MAP SELECTION than the
# reference default (e.g. we expose the stride-2 stem map, or MobileNetV3's
# pre-head 160/96 instead of the 960/576 head conv), the channels listed
# still uniquely pin the architecture width/variant the alias names.
_ENCODER_ALIAS_SPECS = {
    "B0Encoder": ((16, 24, 40, 112, 320), (2, 4, 8, 16, 32)),
    "B1Encoder": ((16, 24, 40, 112, 320), (2, 4, 8, 16, 32)),
    "B2Encoder": ((16, 24, 48, 120, 352), (2, 4, 8, 16, 32)),
    "B3Encoder": ((24, 32, 48, 136, 384), (2, 4, 8, 16, 32)),
    "B4Encoder": ((24, 32, 56, 160, 448), (2, 4, 8, 16, 32)),
    "B5Encoder": ((24, 40, 64, 176, 512), (2, 4, 8, 16, 32)),
    "B6Encoder": ((32, 40, 72, 200, 576), (2, 4, 8, 16, 32)),
    "B7Encoder": ((32, 48, 80, 224, 640), (2, 4, 8, 16, 32)),
    "DPN107Encoder": ((128, 376, 1152, 2432, 2688), (2, 4, 8, 16, 32)),
    "DPN131Encoder": ((128, 352, 832, 1984, 2688), (2, 4, 8, 16, 32)),
    "DPN68BEncoder": ((10, 144, 320, 704, 832), (2, 4, 8, 16, 32)),
    "DPN68Encoder": ((10, 144, 320, 704, 832), (2, 4, 8, 16, 32)),
    "DPN92Encoder": ((64, 336, 704, 1552, 2688), (2, 4, 8, 16, 32)),
    "DenseNet121Encoder": ((64, 256, 512, 1024, 1024), (2, 4, 8, 16, 32)),
    "DenseNet161Encoder": ((96, 384, 768, 2112, 2208), (2, 4, 8, 16, 32)),
    "DenseNet169Encoder": ((64, 256, 512, 1280, 1664), (2, 4, 8, 16, 32)),
    "DenseNet201Encoder": ((64, 256, 512, 1792, 1920), (2, 4, 8, 16, 32)),
    "HRNetV2Encoder18": ((18, 36, 72, 144), (4, 8, 16, 32)),
    "HRNetV2Encoder34": ((34, 68, 136, 272), (4, 8, 16, 32)),
    "HRNetV2Encoder48": ((48, 96, 192, 384), (4, 8, 16, 32)),
    "HRNetW18Encoder": ((18, 36, 72, 144), (4, 8, 16, 32)),
    "HRNetW32Encoder": ((32, 64, 128, 256), (4, 8, 16, 32)),
    "HRNetW48Encoder": ((48, 96, 192, 384), (4, 8, 16, 32)),
    "MaxVitEncoder": ((64, 64, 128, 256, 512), (2, 4, 8, 16, 32)),
    "MitB0Encoder": ((32, 64, 160, 256), (4, 8, 16, 32)),
    "MitB1Encoder": ((64, 128, 320, 512), (4, 8, 16, 32)),
    "MitB2Encoder": ((64, 128, 320, 512), (4, 8, 16, 32)),
    "MitB3Encoder": ((64, 128, 320, 512), (4, 8, 16, 32)),
    "MitB4Encoder": ((64, 128, 320, 512), (4, 8, 16, 32)),
    "MitB5Encoder": ((64, 128, 320, 512), (4, 8, 16, 32)),
    "MixNetXLEncoder": ((24, 40, 64, 192, 320), (2, 4, 8, 16, 32)),
    "MobileNetV3Large": ((16, 24, 40, 112, 160), (2, 4, 8, 16, 32)),
    "MobileNetV3Small": ((16, 16, 24, 48, 96), (2, 4, 8, 16, 32)),
    "MobilenetV2Encoder": ((16, 24, 32, 96, 320), (2, 4, 8, 16, 32)),
    "NFNetF0Encoder": ((128, 256, 512, 1536, 1536), (4, 4, 8, 16, 32)),
    "NFNetF1Encoder": ((128, 256, 512, 1536, 1536), (4, 4, 8, 16, 32)),
    "NFNetF2Encoder": ((128, 256, 512, 1536, 1536), (4, 4, 8, 16, 32)),
    "NFNetF3Encoder": ((128, 256, 512, 1536, 1536), (4, 4, 8, 16, 32)),
    "NFNetF4Encoder": ((128, 256, 512, 1536, 1536), (4, 4, 8, 16, 32)),
    "NFNetF5Encoder": ((128, 256, 512, 1536, 1536), (4, 4, 8, 16, 32)),
    "NFNetF6Encoder": ((128, 256, 512, 1536, 1536), (4, 4, 8, 16, 32)),
    "NFNetF7Encoder": ((128, 256, 512, 1536, 1536), (4, 4, 8, 16, 32)),
    "NFRegNetB0Encoder": ((128, 48, 104, 208, 440), (4, 4, 8, 16, 32)),
    "NFRegNetB1Encoder": ((128, 48, 104, 208, 440), (4, 4, 8, 16, 32)),
    "NFRegNetB2Encoder": ((128, 56, 112, 232, 488), (4, 4, 8, 16, 32)),
    "NFRegNetB3Encoder": ((128, 56, 128, 248, 528), (4, 4, 8, 16, 32)),
    "NFRegNetB4Encoder": ((128, 64, 144, 288, 610), (4, 4, 8, 16, 32)),
    "NFRegNetB5Encoder": ((128, 80, 168, 336, 704), (4, 4, 8, 16, 32)),
    "Resnet101Encoder": ((64, 256, 512, 1024, 2048), (2, 4, 8, 16, 32)),
    "Resnet152Encoder": ((64, 256, 512, 1024, 2048), (2, 4, 8, 16, 32)),
    "Resnet18Encoder": ((64, 64, 128, 256, 512), (2, 4, 8, 16, 32)),
    "Resnet34Encoder": ((64, 64, 128, 256, 512), (2, 4, 8, 16, 32)),
    "Resnet50Encoder": ((64, 256, 512, 1024, 2048), (2, 4, 8, 16, 32)),
    "SENet154Encoder": ((128, 256, 512, 1024, 2048), (2, 4, 8, 16, 32)),
    "SEResNeXt101Encoder": ((64, 256, 512, 1024, 2048), (2, 4, 8, 16, 32)),
    "SEResNeXt50Encoder": ((64, 256, 512, 1024, 2048), (2, 4, 8, 16, 32)),
    "SEResnet101Encoder": ((64, 256, 512, 1024, 2048), (2, 4, 8, 16, 32)),
    "SEResnet152Encoder": ((64, 256, 512, 1024, 2048), (2, 4, 8, 16, 32)),
    "SEResnet50Encoder": ((64, 256, 512, 1024, 2048), (2, 4, 8, 16, 32)),
    "SEXResNet101Encoder": ((64, 256, 512, 1024, 2048), (2, 4, 8, 16, 32)),
    "SEXResNet152Encoder": ((64, 256, 512, 1024, 2048), (2, 4, 8, 16, 32)),
    "SEXResNet18Encoder": ((64, 64, 128, 256, 512), (2, 4, 8, 16, 32)),
    "SEXResNet34Encoder": ((64, 64, 128, 256, 512), (2, 4, 8, 16, 32)),
    "SEXResNet50Encoder": ((64, 256, 512, 1024, 2048), (2, 4, 8, 16, 32)),
    "SKResNeXt50Encoder": ((64, 256, 512, 1024, 2048), (2, 4, 8, 16, 32)),
    "SKResNet18Encoder": ((64, 64, 128, 256, 512), (2, 4, 8, 16, 32)),
    "SWSLResNeXt101Encoder": ((64, 256, 512, 1024, 2048), (2, 4, 8, 16, 32)),
    "SqueezenetEncoder": ((64, 128, 256, 512), (2, 4, 8, 16)),
    "SwinB": ((128, 256, 512, 1024), (4, 8, 16, 32)),
    "SwinL": ((192, 384, 768, 1536), (4, 8, 16, 32)),
    "SwinS": ((96, 192, 384, 768), (4, 8, 16, 32)),
    "SwinT": ((96, 192, 384, 768), (4, 8, 16, 32)),
    "TResNetMEncoder": ((64, 64, 128, 1024, 2048), (4, 4, 8, 16, 32)),
    "TimmB0Encoder": ((16, 24, 40, 112, 320), (2, 4, 8, 16, 32)),
    "TimmB1Encoder": ((16, 24, 40, 112, 320), (2, 4, 8, 16, 32)),
    "TimmB2Encoder": ((16, 24, 48, 120, 352), (2, 4, 8, 16, 32)),
    "TimmB3Encoder": ((24, 32, 48, 136, 384), (2, 4, 8, 16, 32)),
    "TimmB4Encoder": ((24, 32, 56, 160, 448), (2, 4, 8, 16, 32)),
    "TimmB5Encoder": ((24, 40, 64, 176, 512), (2, 4, 8, 16, 32)),
    "TimmB6Encoder": ((32, 40, 72, 200, 576), (2, 4, 8, 16, 32)),
    "TimmB7Encoder": ((32, 48, 80, 224, 640), (2, 4, 8, 16, 32)),
    "TimmHRNetW18SmallV2Encoder": ((18, 36, 72, 144), (4, 8, 16, 32)),
    "TimmMixNetXLEncoder": ((24, 40, 64, 192, 320), (2, 4, 8, 16, 32)),
    "TimmRes2Net101Encoder": ((64, 256, 512, 1024, 2048), (2, 4, 8, 16, 32)),
    "TimmRes2Next50Encoder": ((64, 256, 512, 1024, 2048), (2, 4, 8, 16, 32)),
    "WiderResnet16A2Encoder": ((64, 128, 256, 512, 1024, 2048, 4096), (1, 2, 4, 8, 16, 32, 32)),
    "WiderResnet16Encoder": ((64, 128, 256, 512, 1024, 2048, 4096), (1, 2, 4, 8, 16, 32, 32)),
    "WiderResnet20A2Encoder": ((64, 128, 256, 512, 1024, 2048, 4096), (1, 2, 4, 8, 16, 32, 32)),
    "WiderResnet20Encoder": ((64, 128, 256, 512, 1024, 2048, 4096), (1, 2, 4, 8, 16, 32, 32)),
    "WiderResnet38A2Encoder": ((64, 128, 256, 512, 1024, 2048, 4096), (1, 2, 4, 8, 16, 32, 32)),
    "WiderResnet38Encoder": ((64, 128, 256, 512, 1024, 2048, 4096), (1, 2, 4, 8, 16, 32, 32)),
    "XResNet101Encoder": ((64, 256, 512, 1024, 2048), (2, 4, 8, 16, 32)),
    "XResNet152Encoder": ((64, 256, 512, 1024, 2048), (2, 4, 8, 16, 32)),
    "XResNet18Encoder": ((64, 64, 128, 256, 512), (2, 4, 8, 16, 32)),
    "XResNet34Encoder": ((64, 64, 128, 256, 512), (2, 4, 8, 16, 32)),
    "XResNet50Encoder": ((64, 256, 512, 1024, 2048), (2, 4, 8, 16, 32)),
    "TimmResnet26D": ((64, 256, 512, 1024, 2048), (2, 4, 8, 16, 32)),
    "TimmResnet50D": ((64, 256, 512, 1024, 2048), (2, 4, 8, 16, 32)),
    "TimmResnet101D": ((64, 256, 512, 1024, 2048), (2, 4, 8, 16, 32)),
    "TimmResnet152D": ((64, 256, 512, 1024, 2048), (2, 4, 8, 16, 32)),
    "TimmResnet200D": ((64, 256, 512, 1024, 2048), (2, 4, 8, 16, 32)),
    "TimmSEResnet152D": ((64, 256, 512, 1024, 2048), (2, 4, 8, 16, 32)),
    "StackedHGEncoder": None,  # spec depends on stack_level; checked below
}


def test_encoder_alias_output_specs():
    """Every encoder-class alias must build the architecture its reference
    name means: channels/strides of the resolved factory's output spec are
    pinned to the reference parameterization (table above)."""
    from pytorch_toolbelt_tpu import compat

    checked = 0
    for alias, expected in _ENCODER_ALIAS_SPECS.items():
        if expected is None:
            continue
        spec = getattr(compat, alias)().get_output_spec()
        assert (tuple(spec.channels), tuple(spec.strides)) == expected, alias
        checked += 1
    assert checked >= 100


def test_encoder_alias_table_covers_all_encoder_aliases():
    """The spec table must stay in sync with compat._ALIASES: any NEW alias
    whose target is an encoder factory must be added to the table."""
    from pytorch_toolbelt_tpu.compat import _ALIASES

    covered = set(_ENCODER_ALIAS_SPECS)
    missing = []
    for alias, (_, target) in _ALIASES.items():
        if (
            alias.endswith("Encoder")
            and (target.endswith("_encoder") or target.endswith("Encoder"))
            and not target[0].isupper()  # classes need constructor args; factories are checked
            and alias not in covered
        ):
            missing.append(alias)
    assert not missing, f"encoder aliases missing from _ENCODER_ALIAS_SPECS: {missing}"
