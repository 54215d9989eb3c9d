"""TTA tests (oracles from reference tests/test_tta.py:31-108) + transform
parity against the torch reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_toolbelt_tpu.inference import tta
from conftest import reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="torch reference not importable"
)


def noop(x):
    return x


def sum_all(x):
    return x.sum(axis=(1, 2, 3))


def test_d4_image2mask():
    x = jnp.asarray(np.random.rand(4, 32, 32, 3).astype(np.float32))
    output = tta.d4_image2mask(noop, x)
    np.testing.assert_allclose(np.asarray(output), np.asarray(x), atol=1e-6)


def test_flips_image2mask_roundtrip():
    x = jnp.asarray(np.random.rand(4, 32, 32, 3).astype(np.float32))
    y = tta.flips_image_deaugment(tta.flips_image_augment(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_d2_image2mask_roundtrip():
    x = jnp.asarray(np.random.rand(4, 32, 32, 3).astype(np.float32))
    y = tta.d2_image_deaugment(tta.d2_image_augment(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_d4_image2mask_roundtrip():
    x = jnp.asarray(np.random.rand(4, 32, 32, 3).astype(np.float32))
    y = tta.d4_image_deaugment(tta.d4_image_augment(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_fliplr_image2mask():
    x = jnp.asarray(np.random.rand(4, 32, 32, 3).astype(np.float32))
    output = tta.fliplr_image2mask(noop, x)
    np.testing.assert_allclose(np.asarray(output), np.asarray(x), atol=1e-6)


def test_d4_image2label():
    x = jnp.asarray(
        np.array([[1, 2, 3, 4], [5, 6, 7, 8], [9, 0, 1, 2], [3, 4, 5, 6]], dtype=np.float32)
    )[None, :, :, None]
    output = tta.d4_image2label(sum_all, x)
    assert int(output.squeeze()) == int(x.sum())


def test_fliplr_image2label():
    x = jnp.asarray(
        np.array([[1, 2, 3, 4], [5, 6, 7, 8], [9, 0, 1, 2], [3, 4, 5, 6]], dtype=np.float32)
    )[None, :, :, None]
    output = tta.fliplr_image2label(sum_all, x)
    assert int(output.squeeze()) == int(x.sum())


def test_fivecrop_image2label():
    x = jnp.asarray(
        np.array([[1, 2, 3, 4], [5, 6, 7, 8], [9, 0, 1, 2], [3, 4, 5, 6]], dtype=np.float32)
    )[None, :, :, None]
    output = tta.fivecrop_image2label(sum_all, x, (2, 2)).squeeze()
    expected = ((1 + 2 + 5 + 6) + (3 + 4 + 7 + 8) + (9 + 0 + 3 + 4) + (1 + 2 + 5 + 6) + (6 + 7 + 0 + 1)) / 5
    assert int(output) == expected


def test_tencrop_image2label():
    x = jnp.asarray(
        np.array([[1, 2, 3, 4], [5, 6, 7, 8], [9, 0, 1, 2], [3, 4, 5, 6]], dtype=np.float32)
    )[None, :, :, None]
    output = tta.tencrop_image2label(sum_all, x, (2, 2)).squeeze()
    expected = (2 * ((1 + 2 + 5 + 6) + (3 + 4 + 7 + 8) + (9 + 0 + 3 + 4) + (1 + 2 + 5 + 6) + (6 + 7 + 0 + 1))) / 10
    assert int(output) == expected


def test_ms_image_roundtrip():
    x = jnp.asarray(np.random.rand(2, 64, 64, 3).astype(np.float32))
    augmented = tta.ms_image_augment(x, size_offsets=[0, 32, 64])
    assert [a.shape[1] for a in augmented] == [64, 96, 128]
    merged = tta.ms_image_deaugment(augmented, size_offsets=[0, 32, 64])
    assert merged.shape == x.shape
    # resampling up/down is lossy (the torch reference shows the same ~0.08
    # mean error on uniform noise); when the reference is importable we
    # assert exact behavioral parity instead.
    err = np.abs(np.asarray(merged) - np.asarray(x))
    assert err.mean() < 0.1, err.mean()
    if reference_available():
        import torch
        from pytorch_toolbelt.inference import tta as ref_tta

        xt = torch.tensor(np.moveaxis(np.asarray(x), -1, 1))
        ref = ref_tta.ms_image_deaugment(
            ref_tta.ms_image_augment(xt, [0, 32, 64]), [0, 32, 64]
        ).numpy()
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(merged), -1, 1), ref, atol=1e-5
        )


def test_generalized_tta_dict():
    x = jnp.asarray(np.random.rand(2, 16, 16, 3).astype(np.float32))

    def model(input):
        return {"mask": input, "label": input.sum(axis=(1, 2, 3))}

    wrapper = tta.GeneralizedTTA(
        model,
        augment_fn=tta.d2_image_augment,
        deaugment_fn={"mask": tta.d2_image_deaugment, "label": tta.d2_labels_deaugment},
    )
    out = wrapper(x)
    np.testing.assert_allclose(np.asarray(out["mask"]), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["label"]), np.asarray(x.sum(axis=(1, 2, 3))), atol=1e-3)


def test_multiscale_tta():
    x = jnp.asarray(np.random.rand(2, 32, 32, 3).astype(np.float32))
    wrapper = tta.MultiscaleTTA(noop, size_offsets=[0, 16])
    out = wrapper(x)
    assert out.shape == x.shape


@pytest.mark.parametrize("reduction", ["mean", "sum", "gmean", "hmean", "harmonic1p", "logodd", "log1p"])
def test_reductions_finite(reduction):
    x = jnp.asarray(np.random.rand(8, 2, 4, 4, 3).astype(np.float32)) * 0.9 + 0.05
    out = tta._deaugment_averaging(x, reduction)
    assert out.shape == x.shape[1:]
    assert np.all(np.isfinite(np.asarray(out)))


@requires_reference
def test_d4_transform_parity_with_reference():
    """My NHWC d4 augment/deaugment must match the reference's NCHW ones."""
    import torch
    from pytorch_toolbelt.inference import tta as ref_tta

    x = np.random.RandomState(0).rand(2, 3, 16, 16).astype(np.float32)
    mine_aug = np.asarray(tta.d4_image_augment(jnp.asarray(np.moveaxis(x, 1, -1))))
    ref_aug = ref_tta.d4_image_augment(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.moveaxis(mine_aug, -1, 1), ref_aug, atol=0)

    y = np.random.RandomState(1).rand(16, 5, 16, 16).astype(np.float32)
    mine_deaug = np.asarray(tta.d4_image_deaugment(jnp.asarray(np.moveaxis(y, 1, -1))))
    ref_deaug = ref_tta.d4_image_deaugment(torch.tensor(y)).numpy()
    np.testing.assert_allclose(np.moveaxis(mine_deaug, -1, 1), ref_deaug, atol=1e-6)


@requires_reference
def test_d2_flips_transform_parity_with_reference():
    import torch
    from pytorch_toolbelt.inference import tta as ref_tta

    x = np.random.RandomState(0).rand(2, 3, 8, 8).astype(np.float32)
    xj = jnp.asarray(np.moveaxis(x, 1, -1))
    xt = torch.tensor(x)

    for mine_fn, ref_fn in [
        (tta.d2_image_augment, ref_tta.d2_image_augment),
        (tta.flips_image_augment, ref_tta.flips_image_augment),
        (tta.fliplr_image_augment, ref_tta.fliplr_image_augment),
        (tta.flipud_image_augment, ref_tta.flipud_image_augment),
    ]:
        mine = np.asarray(mine_fn(xj))
        ref = ref_fn(xt).numpy()
        np.testing.assert_allclose(np.moveaxis(mine, -1, 1), ref, atol=0)
