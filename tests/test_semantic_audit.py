"""Semantic audit BEYOND encoders (VERDICT r4 #7).

The encoder alias table (tests/test_api_surface.py) pins every encoder
alias's architecture; this module extends the same guarantee to the rest
of the reference-facing surface:

* decoders — output map-count / channels / strides on a fixed input spec,
  checked against BOTH the module's own ``get_output_spec()`` and the
  actually-produced arrays (a decoder whose default widths drifted fails);
* heads — output shape on the same fixed spec (classification -> [B, C],
  dense heads -> [B, H, W, C] at the requested output_size, supervision
  heads -> per-level maps + stride-keyed dict names);
* scheduler aliases — curve VALUES vs the live torch reference schedulers
  at every epoch of a sampled horizon (reference lr_schedules.py:32-260
  plots these; here they are asserted);
* the loss alias — value on a fixed batch vs the parity-tested target;
* the full torch_* TTA alias table — value vs a numpy oracle per alias
  (reference inference/functional.py:24-160).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="torch reference not importable"
)

from pytorch_toolbelt_tpu.core.interfaces import FeatureMapsSpec

# Fixed input spec shared by the decoder/head audits.
SPEC = FeatureMapsSpec(channels=(16, 24, 40, 64), strides=(4, 8, 16, 32))
IMG = 64
BATCH = 2


def _feature_maps():
    rng = np.random.RandomState(0)
    return [
        jnp.asarray(rng.randn(BATCH, IMG // s, IMG // s, c).astype(np.float32))
        for c, s in zip(SPEC.channels, SPEC.strides)
    ]


def _run_module(module, *call_args, **call_kwargs):
    maps = _feature_maps()
    variables = module.init(jax.random.PRNGKey(0), maps, *call_args, **call_kwargs)
    return module.apply(variables, maps, *call_args, **call_kwargs)


# ---------------------------------------------------------------------------
# Decoders: expected (channels, strides) of the output maps for each decoder
# class built on SPEC with explicit widths.  Values derive from each
# decoder's documented contract (zoo/decoders/*.py docstrings; reference
# counterparts decoders/fpn_cat.py, decoders/unet.py, decoders/deeplab.py,
# decoders/pyramid_pooling.py, decoders/bifpn.py, decoders/can.py).
# ---------------------------------------------------------------------------

def _decoder_cases():
    from pytorch_toolbelt_tpu.zoo import (
        BiFPNDecoder,
        CANDecoder,
        DeeplabV3Decoder,
        DeeplabV3PlusDecoder,
        FPNDecoder,
        PPMDecoder,
        UNetDecoder,
    )

    return [
        ("FPNDecoder", FPNDecoder(input_spec=SPEC, out_channels=32), (32, 32, 32, 32), (4, 8, 16, 32)),
        ("BiFPNDecoder", BiFPNDecoder(input_spec=SPEC, out_channels=24, num_layers=1), (24, 24, 24, 24), (4, 8, 16, 32)),
        ("CANDecoder", CANDecoder(input_spec=SPEC, out_channels=32), (32, 32, 32, 32), (4, 8, 16, 32)),
        ("UNetDecoder", UNetDecoder(input_spec=SPEC, out_channels=(8, 12, 20)), (8, 12, 20), (4, 8, 16)),
        ("DeeplabV3Decoder", DeeplabV3Decoder(input_spec=SPEC, out_channels=8, aspp_channels=16), (8,), (32,)),
        (
            "DeeplabV3PlusDecoder",
            DeeplabV3PlusDecoder(input_spec=SPEC, out_channels=8, aspp_channels=16, low_level_channels=12),
            (8, 16),
            (4, 32),
        ),
        ("PPMDecoder", PPMDecoder(input_spec=SPEC, out_channels=32, pool_sizes=(1, 2)), (32,), (32,)),
    ]


@pytest.mark.parametrize("case", _decoder_cases(), ids=lambda c: c[0])
def test_decoder_output_semantics(case):
    name, decoder, channels, strides = case
    spec = decoder.get_output_spec()
    assert (tuple(spec.channels), tuple(spec.strides)) == (channels, strides), name

    outputs = _run_module(decoder, training=False)
    assert len(outputs) == len(channels), name
    for out, c, s in zip(outputs, channels, strides):
        assert out.shape == (BATCH, IMG // s, IMG // s, c), (name, out.shape, c, s)


# ---------------------------------------------------------------------------
# Heads
# ---------------------------------------------------------------------------

def _classification_head_cases():
    from pytorch_toolbelt_tpu.zoo import (
        FullyConnectedClassificationHead,
        GeneralizedMeanPoolingClassificationHead,
        GlobalAveragePoolingClassificationHead,
        GlobalMaxAvgPoolingClassificationHead,
        GlobalMaxAvgSumPoolingClassificationHead,
        GlobalMaxPoolingClassificationHead,
    )

    classes = [
        GlobalAveragePoolingClassificationHead,
        GlobalMaxPoolingClassificationHead,
        GeneralizedMeanPoolingClassificationHead,
        FullyConnectedClassificationHead,
        GlobalMaxAvgPoolingClassificationHead,
        GlobalMaxAvgSumPoolingClassificationHead,
    ]
    return [(cls.__name__, cls) for cls in classes]


@pytest.mark.parametrize("case", _classification_head_cases(), ids=lambda c: c[0])
def test_classification_head_output_semantics(case):
    name, cls = case
    head = cls(input_spec=SPEC, num_classes=7)
    spec = head.get_output_spec()
    assert tuple(spec.channels) == (7,), name
    logits = _run_module(head, training=False)
    assert logits.shape == (BATCH, 7), (name, logits.shape)


def _dense_head_cases():
    from pytorch_toolbelt_tpu.zoo import (
        HypercolumnHead,
        ProgressiveShuffleHead,
        ResizeHead,
        SegFormerHead,
    )

    return [
        ("ResizeHead", ResizeHead(input_spec=SPEC, num_classes=5), True),
        ("HypercolumnHead", HypercolumnHead(input_spec=SPEC, num_classes=5, mid_channels=16), True),
        ("ProgressiveShuffleHead", ProgressiveShuffleHead(input_spec=SPEC, num_classes=5), False),
        ("SegFormerHead", SegFormerHead(input_spec=SPEC, num_classes=5, embedding_dim=16), True),
    ]


@pytest.mark.parametrize("case", _dense_head_cases(), ids=lambda c: c[0])
def test_dense_head_output_semantics(case):
    name, head, takes_output_size = case
    spec = head.get_output_spec()
    assert (tuple(spec.channels), tuple(spec.strides)) == ((5,), (1,)), name
    if takes_output_size:
        out = _run_module(head, (IMG, IMG), training=False)
    else:
        out = _run_module(head, training=False)
    assert out.shape == (BATCH, IMG, IMG, 5), (name, out.shape)


def test_deep_supervision_head_semantics():
    from pytorch_toolbelt_tpu.datasets import name_for_stride
    from pytorch_toolbelt_tpu.zoo import DeepSupervisionHead

    head = DeepSupervisionHead(input_spec=SPEC, num_classes=3)
    outputs = _run_module(head, training=False)
    assert len(outputs) == len(SPEC)
    for out, s in zip(outputs, SPEC.strides):
        assert out.shape == (BATCH, IMG // s, IMG // s, 3)

    named = DeepSupervisionHead(input_spec=SPEC, num_classes=3, output_name_prefix="mask")
    out_dict = _run_module(named, training=False)
    assert set(out_dict) == {name_for_stride("mask", s) for s in SPEC.strides}
    for s in SPEC.strides:
        assert out_dict[name_for_stride("mask", s)].shape == (BATCH, IMG // s, IMG // s, 3)


# ---------------------------------------------------------------------------
# Scheduler aliases: curve values vs the live torch reference schedulers.
# The reference plots these curves (lr_schedules.py:260-); here each compat
# alias is asserted against the reference class it names, epoch by epoch.
# ---------------------------------------------------------------------------

def _torch_curve(make_scheduler, epochs):
    import torch

    param = torch.nn.Parameter(torch.zeros(1))
    optimizer = torch.optim.SGD([param], lr=BASE_LR)
    scheduler = make_scheduler(optimizer)
    lrs = [scheduler.get_last_lr()[0]]
    for _ in range(epochs - 1):
        optimizer.step()
        scheduler.step()
        lrs.append(scheduler.get_last_lr()[0])
    return np.asarray(lrs)


def _warm_restarts_with_decay(ref, optimizer, **kwargs):
    """Reference CosineAnnealingWarmRestartsWithDecay assigns self.gamma
    AFTER super().__init__(), whose initial step() already calls get_lr()
    — an AttributeError under current torch (lr_schedules.py:99-117).
    Pre-assigning gamma preserves the reference arithmetic exactly."""
    cls = ref.CosineAnnealingWarmRestartsWithDecay
    scheduler = cls.__new__(cls)
    scheduler.gamma = kwargs["gamma"]
    cls.__init__(scheduler, optimizer, **kwargs)
    return scheduler


BASE_LR = 0.1


@requires_reference
@pytest.mark.parametrize(
    "alias_name, make_ours, make_ref_kwargs, epochs",
    [
        (
            "PolyLR",
            lambda compat: compat.PolyLR(base_lr=BASE_LR, max_epoch=20, gamma=0.9),
            lambda ref: (ref.PolyLR, {"max_epoch": 20, "gamma": 0.9}),
            20,
        ),
        (
            "OnceCycleLR",
            lambda compat: compat.OnceCycleLR(base_lr=BASE_LR, epochs=20, min_lr_factor=0.05, max_lr=1.0),
            lambda ref: (ref.OnceCycleLR, {"epochs": 20, "min_lr_factor": 0.05, "max_lr": 1.0}),
            19,  # reference indexes learning_rates[last_epoch]; stay in range
        ),
        (
            "CosineAnnealingLRWithDecay",
            lambda compat: compat.CosineAnnealingLRWithDecay(base_lr=BASE_LR, t_max=10, gamma=0.95),
            lambda ref: (ref.CosineAnnealingLRWithDecay, {"T_max": 10, "gamma": 0.95}),
            10,
        ),
        (
            "CosineAnnealingWarmRestartsWithDecay",
            lambda compat: compat.CosineAnnealingWarmRestartsWithDecay(
                base_lr=BASE_LR, t_0=5, t_mult=1, gamma=0.9
            ),
            lambda ref: (
                lambda opt, **kw: _warm_restarts_with_decay(ref, opt, **kw),
                {"T_0": 5, "T_mult": 1, "gamma": 0.9},
            ),
            15,
        ),
        (
            "CosineAnnealingWarmRestartsWithDecay_tmult2",
            lambda compat: compat.CosineAnnealingWarmRestartsWithDecay(
                base_lr=BASE_LR, t_0=4, t_mult=2, gamma=0.9
            ),
            lambda ref: (
                lambda opt, **kw: _warm_restarts_with_decay(ref, opt, **kw),
                {"T_0": 4, "T_mult": 2, "gamma": 0.9},
            ),
            12,
        ),
        (
            "GradualWarmupScheduler",
            lambda compat: compat.GradualWarmupScheduler(base_lr=BASE_LR, multiplier=4.0, total_epoch=8),
            lambda ref: (ref.GradualWarmupScheduler, {"multiplier": 4.0, "total_epoch": 8}),
            16,
        ),
    ],
    ids=lambda p: p if isinstance(p, str) else "",
)
def test_scheduler_alias_curves_match_reference(alias_name, make_ours, make_ref_kwargs, epochs):
    import pytorch_toolbelt.optimization.lr_schedules as ref

    from pytorch_toolbelt_tpu import compat

    cls, kwargs = make_ref_kwargs(ref)
    ref_lrs = _torch_curve(lambda opt: cls(opt, **kwargs), epochs)
    ours = make_ours(compat)
    our_lrs = np.asarray([ours(e) for e in range(epochs)])
    np.testing.assert_allclose(our_lrs, ref_lrs, rtol=1e-6, atol=1e-9, err_msg=alias_name)


@requires_reference
def test_flat_cosine_annealing_alias_matches_reference_closed_form():
    """The reference FlatCosineAnnealingLR's recursive get_lr accumulates a
    multiplicative chain; its own _get_closed_form_lr is the ground truth
    (lr_schedules.py:252-259) and is what our schedule implements."""
    import pytorch_toolbelt.optimization.lr_schedules as ref

    from pytorch_toolbelt_tpu import compat

    import torch

    t_max, t_flat = 20, 8
    ours = compat.FlatCosineAnnealingLR(base_lr=BASE_LR, t_max=t_max, t_flat=t_flat)

    param = torch.nn.Parameter(torch.zeros(1))
    optimizer = torch.optim.SGD([param], lr=BASE_LR)
    scheduler = ref.FlatCosineAnnealingLR(optimizer, T_max=t_max, T_flat=t_flat)
    for epoch in range(t_max):
        scheduler.last_epoch = epoch
        expected = scheduler._get_closed_form_lr()[0]
        np.testing.assert_allclose(ours(epoch), expected, rtol=1e-6, err_msg=str(epoch))

    # NOTE deliberately NOT compared: the reference's recursive get_lr()
    # diverges from its own closed form — the restart-adjustment branch
    # multiplies by (1+cos(0))/(1+cos(-pi/(T_max-T_flat))) > 1 every epoch
    # of the flat segment (measured: 0.1 -> 0.1147 by epoch 8).  The closed
    # form above is the documented intent (fast.ai fit_flat_cos) and is
    # what our schedule implements.


def test_gradual_warmup_after_schedule_chaining():
    """Our documented chaining contract: past total_epoch the wrapped
    schedule is evaluated at (step - total_epoch)."""
    from pytorch_toolbelt_tpu import compat

    after = compat.PolyLR(base_lr=BASE_LR * 2.0, max_epoch=10)
    sched = compat.GradualWarmupScheduler(
        base_lr=BASE_LR, multiplier=2.0, total_epoch=4, after_schedule=after
    )
    assert sched(0) == BASE_LR
    assert np.isclose(sched(2), BASE_LR * (1.0 + 1.0 * 2 / 4))
    assert np.isclose(sched(4), BASE_LR * 2.0)
    for step in (5, 9, 12):
        assert np.isclose(sched(step), after(step - 4)), step


# ---------------------------------------------------------------------------
# Loss alias: value on a fixed batch vs its parity-tested target.
# ---------------------------------------------------------------------------

def test_sigmoid_focal_loss_alias_value():
    from pytorch_toolbelt_tpu import compat
    from pytorch_toolbelt_tpu.losses import functional as LF

    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(4, 33).astype(np.float32))
    targets = jnp.asarray((rng.rand(4, 33) > 0.5).astype(np.float32))
    got = compat.sigmoid_focal_loss(logits, targets, gamma=2.0, alpha=0.25)
    want = LF.focal_loss_with_logits(logits, targets, gamma=2.0, alpha=0.25)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=0)


# ---------------------------------------------------------------------------
# torch_* TTA aliases: every alias vs a numpy oracle on NHWC.
# Reference semantics: inference/functional.py:24-160 (NCHW dims (2, 3));
# our NHWC twins act on dims (1, 2).  transpose = swap H and W.
# ---------------------------------------------------------------------------

def _np_transpose(a):
    return np.transpose(a, (0, 2, 1, 3))


_TTA_ORACLES = {
    "torch_none": lambda a: a,
    "torch_fliplr": lambda a: a[:, :, ::-1, :],
    "torch_flipud": lambda a: a[:, ::-1, :, :],
    # rot90 CCW on an image with axes (H, W): np.rot90 over (1, 2)
    "torch_rot90_ccw": lambda a: np.rot90(a, k=1, axes=(1, 2)),
    "torch_rot90_cw": lambda a: np.rot90(a, k=-1, axes=(1, 2)),
    "torch_rot90": lambda a: np.rot90(a, k=1, axes=(1, 2)),
    "torch_rot270": lambda a: np.rot90(a, k=-1, axes=(1, 2)),
    "torch_rot180": lambda a: np.rot90(a, k=2, axes=(1, 2)),
    "torch_rot180_transpose": lambda a: _np_transpose(np.rot90(a, k=2, axes=(1, 2))),
    "torch_transpose_rot180": lambda a: np.rot90(_np_transpose(a), k=2, axes=(1, 2)),
    "torch_rot90_ccw_transpose": lambda a: _np_transpose(np.rot90(a, k=1, axes=(1, 2))),
    "torch_rot90_cw_transpose": lambda a: _np_transpose(np.rot90(a, k=-1, axes=(1, 2))),
    "torch_transpose_rot90_ccw": lambda a: np.rot90(_np_transpose(a), k=1, axes=(1, 2)),
    "torch_transpose_rot90_cw": lambda a: np.rot90(_np_transpose(a), k=-1, axes=(1, 2)),
    "torch_transpose": _np_transpose,
    "torch_transpose_": _np_transpose,
    "torch_transpose2": lambda a: _np_transpose(np.rot90(a, k=2, axes=(1, 2))),
}


def test_all_torch_tta_aliases_match_numpy_oracles():
    from pytorch_toolbelt_tpu import compat

    rng = np.random.RandomState(3)
    a = rng.randn(2, 6, 6, 3).astype(np.float32)  # square: transpose-composites well-defined
    x = jnp.asarray(a)
    checked = 0
    for alias, oracle in _TTA_ORACLES.items():
        got = np.asarray(getattr(compat, alias)(x))
        np.testing.assert_array_equal(got, oracle(a), err_msg=alias)
        checked += 1
    assert checked == 17
