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
