"""Loss tests: closed-form oracles (ported behaviorally from
reference tests/test_losses.py) + numerical value/grad parity against the
torch reference implementation within 1e-5 (BASELINE.md fidelity target)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorch_toolbelt_tpu.losses as L
import pytorch_toolbelt_tpu.losses.functional as F

from conftest import reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="torch reference not importable"
)

RNG = np.random.RandomState(42)


# ---------------------------------------------------------------------------
# Closed-form oracles (reference tests/test_losses.py:84-267)
# ---------------------------------------------------------------------------


def test_sigmoid_focal_loss_ordering():
    input_good = jnp.array([10, -10, 10], dtype=jnp.float32)
    input_bad = jnp.array([-1, 2, 0], dtype=jnp.float32)
    target = jnp.array([1, 0, 1])
    assert F.focal_loss_with_logits(input_good, target) < F.focal_loss_with_logits(input_bad, target)
    loss_cls = L.BinaryFocalLoss()
    assert loss_cls(input_good, target) < loss_cls(input_bad, target)


def test_softmax_focal_loss_ordering():
    input_good = jnp.array([[0, 10, 0], [10, 0, 0], [0, 0, 10]], dtype=jnp.float32)
    input_bad = jnp.array([[0, -10, 0], [0, 10, 0], [0, 0, 10]], dtype=jnp.float32)
    target = jnp.array([1, 0, 2])
    assert F.softmax_focal_loss_with_logits(input_good, target) < F.softmax_focal_loss_with_logits(
        input_bad, target
    )
    loss_cls = L.CrossEntropyFocalLoss()
    assert loss_cls(input_good, target) < loss_cls(input_bad, target)


@pytest.mark.parametrize(
    ["y_true", "y_pred", "expected"],
    [
        [[1, 1, 1, 1], [1, 1, 1, 1], 1.0],
        [[0, 1, 1, 0], [0, 1, 1, 0], 1.0],
        [[1, 1, 1, 1], [1, 1, 0, 0], 0.5],
    ],
)
def test_soft_jaccard_score(y_true, y_pred, expected):
    actual = F.soft_jaccard_score(jnp.array(y_pred, jnp.float32), jnp.array(y_true, jnp.float32), eps=1e-5)
    assert float(actual) == pytest.approx(expected, 1e-5)


@pytest.mark.parametrize(
    ["y_true", "y_pred", "expected"],
    [
        [[1, 1, 1, 1], [1, 1, 1, 1], 1.0],
        [[0, 1, 1, 0], [0, 1, 1, 0], 1.0],
        [[1, 1, 1, 1], [1, 1, 0, 0], 2.0 / 3.0],
    ],
)
def test_soft_dice_score(y_true, y_pred, expected):
    actual = F.soft_dice_score(jnp.array(y_pred, jnp.float32), jnp.array(y_true, jnp.float32), eps=1e-5)
    assert float(actual) == pytest.approx(expected, 1e-5)


def test_dice_loss_binary():
    eps = 1e-5
    criterion = L.DiceLoss(mode="binary", from_logits=False)
    # ideal cases
    for pred, true in [([1.0, 1, 1], [1, 1, 1]), ([1.0, 0, 1], [1, 0, 1]), ([0.0, 0, 0], [0, 0, 0])]:
        loss = criterion(jnp.array(pred).reshape(1, 1, 1, -1), jnp.array(true).reshape(1, 1, 1, -1))
        assert float(loss) == pytest.approx(0.0, abs=eps)
    # worst cases
    assert float(
        criterion(jnp.array([1.0, 1, 1]).reshape(1, 1, -1), jnp.array([0, 0, 0]).reshape(1, 1, 1, -1))
    ) == pytest.approx(0.0, abs=eps)  # no GT pixels => zeroed channel
    assert float(
        criterion(jnp.array([1.0, 0, 1]).reshape(1, 1, -1), jnp.array([0, 1, 0]).reshape(1, 1, 1, -1))
    ) == pytest.approx(1.0, abs=eps)
    assert float(
        criterion(jnp.array([0.0, 0, 0]).reshape(1, 1, -1), jnp.array([1, 1, 1]).reshape(1, 1, 1, -1))
    ) == pytest.approx(1.0, abs=eps)


def test_multiclass_jaccard_loss():
    eps = 1e-5
    criterion = L.JaccardLoss(mode="multiclass", from_logits=False)
    # channels-last: [B, N, C]
    y_pred = jnp.array([[[1.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 1.0]]]).transpose(0, 2, 1)
    assert float(criterion(y_pred, jnp.array([[0, 0, 1, 1]]))) == pytest.approx(0.0, abs=eps)
    assert float(criterion(y_pred, jnp.array([[1, 1, 0, 0]]))) == pytest.approx(1.0, abs=eps)
    y_pred2 = jnp.array([[[1.0, 0.0, 1.0, 0.0], [0.0, 1.0, 0.0, 1.0]]]).transpose(0, 2, 1)
    assert float(criterion(y_pred2, jnp.array([[1, 1, 0, 0]]))) == pytest.approx(1 - 1 / 3, abs=eps)


def test_multilabel_jaccard_loss():
    eps = 1e-5
    criterion = L.JaccardLoss(mode="multilabel", from_logits=False)
    y_pred = jnp.array([[[1.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 1.0]]]).transpose(0, 2, 1)
    assert float(criterion(y_pred, y_pred)) == pytest.approx(0.0, abs=eps)
    assert float(criterion(y_pred, 1 - y_pred)) == pytest.approx(1.0, abs=eps)
    y_pred3 = jnp.array([[[0.0, 1.0, 1.0, 0.0], [0.0, 1.0, 1.0, 0.0]]]).transpose(0, 2, 1)
    y_true3 = jnp.array([[[1.0, 1.0, 0.0, 0.0], [1.0, 1.0, 0.0, 0.0]]]).transpose(0, 2, 1)
    assert float(criterion(y_pred3, y_true3)) == pytest.approx(1 - 1 / 3, abs=eps)


def test_soft_ce_matches_plain_ce():
    y_pred = jnp.array(
        [[+1, -1, -1, -1], [-1, +1, -1, -1], [-1, -1, +1, -1], [-1, -1, -1, +1]], dtype=jnp.float32
    )
    y_true = jnp.array([0, 1, 2, 3])
    actual = float(L.SoftCrossEntropyLoss(smooth_factor=0.0)(y_pred, y_true))
    logp = jax.nn.log_softmax(y_pred, axis=-1)
    expected = float(-jnp.take_along_axis(logp, y_true[:, None], axis=-1).mean())
    np.testing.assert_almost_equal(actual, expected, decimal=6)


@pytest.mark.parametrize(
    "criterion",
    [
        # NOTE: t1=1.0 with t2<1 yields nan in the torch reference too
        # (finite-support probabilities hit exact 0, then 0*log(0)).
        L.BiTemperedLogisticLoss(t1=0.9, t2=0.8),
        L.FocalCosineLoss(),
        L.BinaryFocalLoss(),
        L.CrossEntropyFocalLoss(),
        L.SoftF1Loss(),
        L.SoftCrossEntropyLoss(),
        L.LovaszLoss(),
    ],
)
def test_classification_losses_smoke(criterion):
    y_pred = jnp.array(
        [[+9, -9, -9, -9], [-9, +9, -9, -9], [-9, -9, +9, -9], [-9, -9, -9, +9]], dtype=jnp.float32
    )
    y_true = jnp.array([0, 1, 2, 3])
    loss = criterion(y_pred, y_true)
    assert np.isfinite(float(loss))


def test_binary_bi_tempered_loss_shape():
    loss = L.BinaryBiTemperedLogisticLoss(t1=0.9, t2=3.0, ignore_index=-100)
    y_pred = jnp.asarray(RNG.randn(2, 64, 64, 1).astype(np.float32))
    y_true = (y_pred > 0).astype(jnp.float32)
    y_true = y_true.at[:, ::10, ::20, :].set(-100)
    value = loss(y_pred, y_true)
    assert value.ndim == 0 and np.isfinite(float(value))


# ---------------------------------------------------------------------------
# Value + gradient parity against the torch reference
# ---------------------------------------------------------------------------


def _parity(jax_fn, torch_fn, np_logits, atol=1e-5, grad_atol=5e-5, check_grad=True):
    """Compare loss value and d(loss)/d(logits) between jax and torch impls.

    Values must match within 1e-5 (BASELINE.md target); gradients get a bit
    of extra fp32 accumulation-order slack.
    """
    import torch

    value_j = np.asarray(jax_fn(jnp.asarray(np_logits)), dtype=np.float64)
    if check_grad:
        grad_j = np.asarray(jax.grad(lambda x: jax_fn(x).sum())(jnp.asarray(np_logits)))

    t_logits = torch.tensor(np_logits, requires_grad=True)
    value_t = torch_fn(t_logits)
    if check_grad:
        value_t.sum().backward()
        grad_t = t_logits.grad.numpy()
    value_t = value_t.detach().numpy().astype(np.float64)

    np.testing.assert_allclose(value_j, value_t, atol=atol, rtol=1e-5)
    if check_grad:
        np.testing.assert_allclose(grad_j, grad_t, atol=grad_atol, rtol=1e-4)


@requires_reference
@pytest.mark.parametrize("gamma,alpha,normalized,reduced_threshold,ignore", [
    (2.0, 0.25, False, None, None),
    (2.0, None, False, None, None),
    (1.5, 0.4, True, None, None),
    (2.0, 0.25, False, 0.5, None),
    (2.0, 0.25, False, None, -100),
])
def test_focal_parity(gamma, alpha, normalized, reduced_threshold, ignore):
    import pytorch_toolbelt.losses.functional as RF

    logits = RNG.randn(4, 3, 16, 16).astype(np.float32)
    target = (RNG.rand(4, 3, 16, 16) > 0.5).astype(np.float32)
    if ignore is not None:
        target[:, :, ::5, ::3] = ignore
    target_j = jnp.asarray(target)

    _parity(
        lambda x: F.focal_loss_with_logits(
            x, target_j, gamma=gamma, alpha=alpha, normalized=normalized,
            reduced_threshold=reduced_threshold, ignore_index=ignore,
        ),
        lambda x: RF.focal_loss_with_logits(
            x, __import__("torch").tensor(target), gamma=gamma, alpha=alpha,
            normalized=normalized, reduced_threshold=reduced_threshold, ignore_index=ignore,
        ),
        logits,
    )


@requires_reference
@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_softmax_focal_parity(reduction):
    import torch
    import pytorch_toolbelt.losses.functional as RF

    logits = RNG.randn(4, 5, 8, 8).astype(np.float32)  # torch layout [B,C,H,W]
    target = RNG.randint(0, 5, size=(4, 8, 8))
    target[:, ::4, ::4] = -100
    logits_j = np.moveaxis(logits, 1, -1)  # -> [B,H,W,C]

    _parity(
        lambda x: F.softmax_focal_loss_with_logits(
            jnp.moveaxis(x, -1, -1), jnp.asarray(target), reduction=reduction
        ),
        lambda x: RF.softmax_focal_loss_with_logits(
            x.moveaxis(-1, 1), torch.tensor(target), reduction=reduction
        ),
        logits_j,
    )


@requires_reference
@pytest.mark.parametrize("mode", ["binary", "multiclass", "multilabel"])
@pytest.mark.parametrize("log_loss", [False, True])
def test_dice_parity(mode, log_loss):
    import torch
    from pytorch_toolbelt.losses import DiceLoss as RefDice

    num_classes = 5
    logits = RNG.randn(4, num_classes, 16, 16).astype(np.float32)
    if mode == "multiclass":
        target_t = RNG.randint(0, num_classes, size=(4, 16, 16))
        target_j = target_t
    elif mode == "multilabel":
        target_t = (RNG.rand(4, num_classes, 16, 16) > 0.5).astype(np.float32)
        target_j = np.moveaxis(target_t, 1, -1)
    else:
        logits = logits[:, :1]
        target_t = (RNG.rand(4, 1, 16, 16) > 0.5).astype(np.float32)
        target_j = np.moveaxis(target_t, 1, -1)

    logits_j = np.moveaxis(logits, 1, -1)
    mine = L.DiceLoss(mode=mode, log_loss=log_loss)
    ref = RefDice(mode=mode, log_loss=log_loss)

    _parity(
        lambda x: mine(x, jnp.asarray(target_j)),
        lambda x: ref(x.moveaxis(-1, 1), torch.tensor(target_t)),
        logits_j,
    )


@requires_reference
@pytest.mark.parametrize("mode", ["binary", "multiclass", "multilabel"])
def test_jaccard_parity(mode):
    import torch
    from pytorch_toolbelt.losses import JaccardLoss as RefJaccard

    num_classes = 5
    logits = RNG.randn(4, num_classes, 16, 16).astype(np.float32)
    if mode == "multiclass":
        target_t = RNG.randint(0, num_classes, size=(4, 16, 16))
        target_j = target_t
    elif mode == "multilabel":
        target_t = (RNG.rand(4, num_classes, 16, 16) > 0.5).astype(np.float32)
        target_j = np.moveaxis(target_t, 1, -1)
    else:
        logits = logits[:, :1]
        target_t = (RNG.rand(4, 1, 16, 16) > 0.5).astype(np.float32)
        target_j = np.moveaxis(target_t, 1, -1)

    logits_j = np.moveaxis(logits, 1, -1)
    mine = L.JaccardLoss(mode=mode)
    ref = RefJaccard(mode=mode)

    _parity(
        lambda x: mine(x, jnp.asarray(target_j)),
        lambda x: ref(x.moveaxis(-1, 1), torch.tensor(target_t)),
        logits_j,
    )


@requires_reference
@pytest.mark.parametrize("per_image", [False, True])
@pytest.mark.parametrize("ignore", [None, -100])
def test_binary_lovasz_parity(per_image, ignore):
    import torch
    from pytorch_toolbelt.losses import BinaryLovaszLoss as RefLoss

    logits = RNG.randn(4, 16, 16).astype(np.float32)
    target = (RNG.rand(4, 16, 16) > 0.5).astype(np.float32)
    if ignore is not None:
        target[:, ::5, ::3] = ignore

    mine = L.BinaryLovaszLoss(per_image=per_image, ignore_index=ignore)
    ref = RefLoss(per_image=per_image, ignore_index=ignore)

    _parity(
        lambda x: mine(x, jnp.asarray(target)),
        lambda x: ref(x, torch.tensor(target)),
        logits,
    )


@requires_reference
@pytest.mark.parametrize("per_image", [False, True])
@pytest.mark.parametrize("ignore", [None, 255])
def test_lovasz_softmax_parity(per_image, ignore):
    import torch
    from pytorch_toolbelt.losses import LovaszLoss as RefLoss

    num_classes = 4
    rng = np.random.RandomState(7)
    probas = jax.nn.softmax(jnp.asarray(rng.randn(2, num_classes, 12, 12).astype(np.float32)), axis=1)
    probas = np.asarray(probas)
    target = rng.randint(0, num_classes, size=(2, 12, 12))
    if ignore is not None:
        target[:, ::4, ::4] = ignore

    probas_j = np.moveaxis(probas, 1, -1)
    mine = L.LovaszLoss(per_image=per_image, ignore=ignore)
    ref = RefLoss(per_image=per_image, ignore=ignore)

    _parity(
        lambda x: mine(x, jnp.asarray(target)),
        lambda x: ref(x.moveaxis(-1, 1), torch.tensor(target)),
        probas_j,
    )


@requires_reference
@pytest.mark.parametrize("per_image", [False, True])
def test_lovasz_softmax_compact_keys_parity(per_image):
    """The 16-bit compact-key sort (losses/lovasz.py COMPACT_SORT_KEYS) must
    match the torch reference like the exact path does.  At this size the
    payload's spare tie-break bits retain the full monotonic-int32 key, so
    the ordering — and therefore value AND gradient — is exact; at the bench
    shape (2^23 pixels) ordering truncates to 23 bits (documented in
    benchmarks/RESULTS.md)."""
    import torch
    from pytorch_toolbelt.losses import LovaszLoss as RefLoss

    from pytorch_toolbelt_tpu.losses import lovasz as lovasz_mod

    num_classes = 4
    rng = np.random.RandomState(11)
    probas = jax.nn.softmax(jnp.asarray(rng.randn(2, num_classes, 12, 12).astype(np.float32)), axis=1)
    probas = np.asarray(probas)
    target = rng.randint(0, num_classes, size=(2, 12, 12))

    probas_j = np.moveaxis(probas, 1, -1)
    mine = L.LovaszLoss(per_image=per_image)
    ref = RefLoss(per_image=per_image)

    lovasz_mod.COMPACT_SORT_KEYS = True
    try:
        _parity(
            lambda x: mine(x, jnp.asarray(target)),
            lambda x: ref(x.moveaxis(-1, 1), torch.tensor(target)),
            probas_j,
        )
    finally:
        lovasz_mod.COMPACT_SORT_KEYS = False


@requires_reference
@pytest.mark.parametrize("t1,t2", [(1.0, 1.0), (0.8, 1.4), (0.9, 3.0), (1.0, 0.8), (0.5, 0.7)])
def test_bitempered_parity(t1, t2):
    import torch
    from pytorch_toolbelt.losses import BiTemperedLogisticLoss as RefLoss

    logits = RNG.randn(8, 5).astype(np.float32)
    target = RNG.randint(0, 5, size=(8,))

    mine = L.BiTemperedLogisticLoss(t1=t1, t2=t2, smoothing=0.1)
    ref = RefLoss(t1=t1, t2=t2, smoothing=0.1)

    _parity(
        lambda x: mine(x, jnp.asarray(target)),
        lambda x: ref(x, torch.tensor(target)),
        logits,
    )


@requires_reference
def test_soft_bce_parity():
    import torch
    from pytorch_toolbelt.losses import SoftBCEWithLogitsLoss as RefLoss

    logits = RNG.randn(4, 1, 16, 16).astype(np.float32)
    target = (RNG.rand(4, 1, 16, 16) > 0.5).astype(np.float32)
    target[:, :, ::7] = -100

    mine = L.SoftBCEWithLogitsLoss(smooth_factor=0.1, ignore_index=-100)
    ref = RefLoss(smooth_factor=0.1, ignore_index=-100)

    _parity(
        lambda x: mine(x, jnp.asarray(target)),
        lambda x: ref(x, torch.tensor(target)),
        logits,
    )


@requires_reference
def test_soft_ce_parity():
    import torch
    from pytorch_toolbelt.losses import SoftCrossEntropyLoss as RefLoss

    logits = RNG.randn(8, 5).astype(np.float32)
    target = RNG.randint(0, 5, size=(8,))
    target[::3] = -100

    mine = L.SoftCrossEntropyLoss(smooth_factor=0.1, ignore_index=-100)
    ref = RefLoss(smooth_factor=0.1, ignore_index=-100)

    _parity(lambda x: mine(x, jnp.asarray(target)), lambda x: ref(x, torch.tensor(target)), logits)


@requires_reference
def test_balanced_bce_parity():
    import torch
    import pytorch_toolbelt.losses as RL

    logits = RNG.randn(16).astype(np.float32)
    target = (RNG.rand(16) > 0.7).astype(np.float32)

    _parity(
        lambda x: F.balanced_binary_cross_entropy_with_logits(x, jnp.asarray(target), gamma=1.0),
        lambda x: RL.balanced_binary_cross_entropy_with_logits(x, torch.tensor(target), gamma=1.0),
        logits,
    )


@requires_reference
def test_wing_logcosh_qfl_parity():
    import torch
    import pytorch_toolbelt.losses as RL
    import pytorch_toolbelt.losses.functional as RF

    pred = RNG.randn(8, 10).astype(np.float32) * 10
    target = RNG.randn(8, 10).astype(np.float32) * 10

    _parity(
        lambda x: F.wing_loss(x, jnp.asarray(target)),
        lambda x: RF.wing_loss(x, torch.tensor(target)),
        pred,
    )
    _parity(
        lambda x: F.log_cosh_loss(x, jnp.asarray(target)),
        lambda x: RF.log_cosh_loss(x, torch.tensor(target)),
        pred,
    )

    qt = (RNG.rand(8, 10)).astype(np.float32)
    _parity(
        lambda x: L.QualityFocalLoss(beta=2.0)(x, jnp.asarray(qt)),
        lambda x: RL.QualityFocalLoss(beta=2.0)(x, torch.tensor(qt)),
        pred,
    )


@requires_reference
def test_soft_f1_focal_cosine_parity():
    import torch
    import pytorch_toolbelt.losses as RL

    logits = RNG.randn(16, 5).astype(np.float32)
    target = RNG.randint(0, 5, size=(16,))

    _parity(
        lambda x: L.SoftF1Loss()(x, jnp.asarray(target)),
        lambda x: RL.SoftF1Loss()(x, torch.tensor(target)),
        logits,
    )
    _parity(
        lambda x: L.FocalCosineLoss()(x, jnp.asarray(target)),
        lambda x: RL.FocalCosineLoss()(x, torch.tensor(target)),
        logits,
    )

    blogits = RNG.randn(32).astype(np.float32)
    btarget = (RNG.rand(32) > 0.5).astype(np.float32)
    _parity(
        lambda x: L.BinarySoftF1Loss()(x, jnp.asarray(btarget)),
        lambda x: RL.BinarySoftF1Loss()(x, torch.tensor(btarget)),
        blogits,
    )


def test_joint_loss():
    dice = L.DiceLoss(mode="binary")
    focal = L.BinaryFocalLoss()
    joint = L.JointLoss(dice, focal, 1.0, 0.5)
    pred = jnp.asarray(RNG.randn(2, 8, 8, 1).astype(np.float32))
    true = jnp.asarray((RNG.rand(2, 8, 8, 1) > 0.5).astype(np.float32))
    expected = float(dice(pred, true)) + 0.5 * float(focal(pred, true))
    assert float(joint(pred, true)) == pytest.approx(expected, rel=1e-6)


def test_losses_are_jittable():
    """Every wrapper must be hashable + jit-compatible as a closure."""
    pred = jnp.asarray(RNG.randn(2, 8, 8, 3).astype(np.float32))
    tgt_int = jnp.asarray(RNG.randint(0, 3, size=(2, 8, 8)))
    tgt_bin = jnp.asarray((RNG.rand(2, 8, 8, 3) > 0.5).astype(np.float32))

    for loss, tgt in [
        (L.DiceLoss(mode="multiclass"), tgt_int),
        (L.JaccardLoss(mode="multilabel"), tgt_bin),
        (L.CrossEntropyFocalLoss(), tgt_int),
        (L.BinaryFocalLoss(), tgt_bin),
        (L.LovaszLoss(), tgt_int),
        (L.BiTemperedLogisticLoss(t1=0.8, t2=1.4), tgt_int),
        (L.SoftCrossEntropyLoss(), tgt_int),
    ]:
        value = jax.jit(lambda p, t, loss=loss: loss(p, t))(pred, tgt)
        assert np.isfinite(float(value))
        g = jax.jit(jax.grad(lambda p, t, loss=loss: loss(p, t)))(pred, tgt)
        assert np.all(np.isfinite(np.asarray(g)))


def test_soft_f1_ignore_index():
    """ignore_index must mask whole rows by integer label. NOTE: the torch
    reference's own SoftF1Loss crashes here (soft_f1.py:88 one-hots the raw
    labels including -100 before filtering: 'Class values must be
    non-negative'), so the oracle is computed manually per the documented
    intent (drop ignored rows, then mean(1 - soft-F1))."""
    logits = RNG.randn(12, 4).astype(np.float32)
    target = RNG.randint(0, 4, size=(12,))
    target[::4] = -100

    mine = float(L.SoftF1Loss(ignore_index=-100)(jnp.asarray(logits), jnp.asarray(target)))

    keep = target != -100
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits[keep]), axis=-1))
    probs = np.clip(probs, 1e-6, 1 - 1e-6)
    oh = np.eye(4)[target[keep]]
    tp = (probs * oh).sum(0)
    fp = (probs * (1 - oh)).sum(0)
    fn = ((1 - probs) * oh).sum(0)
    expected = float((1 - 2 * tp / (2 * tp + fn + fp + 1e-6)).mean())
    assert mine == pytest.approx(expected, abs=2e-5)


# ---------------------------------------------------------------------------
# Fused custom-VJP fast paths vs the generic jax-AD route (round 5)
# ---------------------------------------------------------------------------


def _fused_ab(loss, pred, tgt, atol=2e-6, grad_atol=2e-6):
    """The fused (default) and AD (fused.ENABLED=False) routes of the SAME
    loss object must agree in value and d(loss)/d(logits)."""
    from pytorch_toolbelt_tpu.losses import fused

    def value(p):
        return loss(p, tgt)

    assert fused.ENABLED
    v_fused, g_fused = jax.value_and_grad(value)(pred)
    fused.ENABLED = False
    try:
        v_ad, g_ad = jax.value_and_grad(value)(pred)
    finally:
        fused.ENABLED = True
    np.testing.assert_allclose(float(v_fused), float(v_ad), atol=atol, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ad), atol=grad_atol, rtol=1e-4)


@pytest.mark.parametrize("log_loss", [False, True])
@pytest.mark.parametrize("mode,ignore,classes", [
    ("binary", None, None),
    ("binary", -100, None),
    ("multilabel", None, None),
    ("multilabel", -100, (0, 2)),
    ("multiclass", None, (1, 3)),
])
def test_fused_dice_matches_ad(mode, ignore, classes, log_loss):
    if mode == "multiclass":
        pred = jnp.asarray(RNG.randn(2, 8, 8, 5).astype(np.float32))
        tgt = jnp.asarray(RNG.randint(0, 5, size=(2, 8, 8)))
    elif mode == "multilabel":
        pred = jnp.asarray(RNG.randn(2, 8, 8, 5).astype(np.float32))
        t = (RNG.rand(2, 8, 8, 5) > 0.5).astype(np.float32)
        if ignore is not None:
            t[:, ::3] = ignore
        tgt = jnp.asarray(t)
    else:
        pred = jnp.asarray(RNG.randn(2, 8, 8, 1).astype(np.float32))
        t = (RNG.rand(2, 8, 8, 1) > 0.5).astype(np.float32)
        if ignore is not None:
            t[:, ::3] = ignore
        tgt = jnp.asarray(t)
    loss = L.DiceLoss(mode=mode, log_loss=log_loss, ignore_index=ignore, classes=classes,
                      smooth=0.1)
    _fused_ab(loss, pred, tgt)


@pytest.mark.parametrize("log_loss", [False, True])
@pytest.mark.parametrize("mode,classes", [
    ("binary", None),
    ("multilabel", None),
    ("multilabel", (1, 4)),
    ("multiclass", None),
    ("multiclass", (0, 2)),
])
def test_fused_jaccard_matches_ad(mode, classes, log_loss):
    if mode == "multiclass":
        pred = jnp.asarray(RNG.randn(2, 8, 8, 5).astype(np.float32))
        tgt = jnp.asarray(RNG.randint(0, 5, size=(2, 8, 8)))
    elif mode == "multilabel":
        pred = jnp.asarray(RNG.randn(2, 8, 8, 5).astype(np.float32))
        tgt = jnp.asarray((RNG.rand(2, 8, 8, 5) > 0.5).astype(np.float32))
    else:
        pred = jnp.asarray(RNG.randn(2, 8, 8).astype(np.float32))
        tgt = jnp.asarray((RNG.rand(2, 8, 8) > 0.5).astype(np.float32))
    loss = L.JaccardLoss(mode=mode, log_loss=log_loss, classes=classes, smooth=0.05)
    _fused_ab(loss, pred, tgt)


def test_fused_iou_empty_class_zeroed():
    """A class absent from the GT must contribute zero loss AND zero
    gradient flow through its score (the t_sum>0 mask), fused and AD alike."""
    pred = jnp.asarray(RNG.randn(2, 8, 8, 3).astype(np.float32))
    t = np.zeros((2, 8, 8, 3), np.float32)
    t[..., 0] = 1.0  # classes 1, 2 empty
    tgt = jnp.asarray(t)
    for loss in (L.DiceLoss(mode="multilabel"), L.JaccardLoss(mode="multilabel")):
        _fused_ab(loss, pred, tgt)
        v = float(loss(pred, tgt))
        assert np.isfinite(v)
