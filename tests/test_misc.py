"""Coverage for small surfaces: modules alias, FeatureMapsSpec helpers,
class-subset losses, stacked-params ensembling with a real flax model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_modules_alias_surface():
    import pytorch_toolbelt_tpu.modules as m

    # reference-style imports all resolve through the alias namespace
    for name in ["UnetBlock", "ACT_RELU", "FPNDecoder", "ResizeHead",
                 "FeatureMapsSpecification", "instantiate_activation_block",
                 "GlobalAvgPool2d", "resnet50_encoder"]:
        assert hasattr(m, name), name


def test_feature_maps_spec_helpers():
    from pytorch_toolbelt_tpu.core import FeatureMapsSpec

    spec = FeatureMapsSpec((16, 32, 64), (4, 8, 16))
    assert len(spec) == 3
    assert spec.get_index_of_largest_feature_map() == 0
    dummy = spec.get_dummy_input(image_size=(64, 32))
    assert [d.shape for d in dummy] == [(1, 16, 8, 16), (1, 8, 4, 32), (1, 4, 2, 64)]
    with pytest.raises(ValueError):
        FeatureMapsSpec((1, 2), (1,))


def test_dice_class_subset():
    import pytorch_toolbelt_tpu.losses as L

    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.rand(2, 8, 8, 4).astype(np.float32))
    true = jnp.asarray(rng.randint(0, 4, size=(2, 8, 8)))
    full = L.DiceLoss(mode="multiclass", from_logits=False)
    subset = L.DiceLoss(mode="multiclass", from_logits=False, classes=(1, 2))
    # subset loss equals mean of the selected per-class losses
    v_subset = float(subset(pred, true))
    assert np.isfinite(v_subset)
    assert v_subset != pytest.approx(float(full(pred, true)))


def test_ensembler_from_stacked_real_model():
    from pytorch_toolbelt_tpu.inference import Ensembler
    from pytorch_toolbelt_tpu.zoo import UNetSegmentationModel

    model = UNetSegmentationModel(num_classes=1, encoder_channels=4, num_layers=2)
    x = jnp.zeros((1, 32, 32, 3))
    v1 = model.init(jax.random.PRNGKey(0), x)
    v2 = model.init(jax.random.PRNGKey(1), x)
    stacked = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), v1, v2)

    ens = Ensembler.from_stacked(lambda v, t: model.apply(v, t), stacked)
    out = ens(x)
    expected = (model.apply(v1, x) + model.apply(v2, x)) / 2
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)
