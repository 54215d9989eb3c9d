"""Batched test-time augmentation (parity target:
pytorch_toolbelt/inference/tta.py:63-801).

All transforms stack along the batch axis so the model runs ONE batched
forward; under jit, augment -> model -> deaugment -> reduction fuses into a
single XLA program on TPU.  Everything is differentiable and usable at
training time, like the reference.

Model wrappers (GeneralizedTTA / MultiscaleTTA) take a plain callable
``model_fn(x) -> array | dict | list`` — in flax terms, usually
``lambda x: model.apply(variables, x)``.
"""

from functools import partial
from typing import Callable, Dict, List, Optional, Tuple, Union

import jax.numpy as jnp

from ..nn.functional import resize_2d
from . import functional as F

__all__ = [
    "GeneralizedTTA",
    "TTAWrapper",
    "MultiscaleTTA",
    "d2_image_augment",
    "d2_labels_augment",
    "d2_image_deaugment",
    "d2_labels_deaugment",
    "d4_image2label",
    "d4_image2mask",
    "d4_image_augment",
    "d4_image_augment_views",
    "d4_labels_augment",
    "d4_image_deaugment",
    "d4_image_deaugment_views",
    "d4_labels_deaugment",
    "fivecrop_image2label",
    "fivecrop_image_augment",
    "fivecrop_label_deaugment",
    "fliplr_image2label",
    "fliplr_image2mask",
    "fliplr_image_augment",
    "fliplr_labels_augment",
    "fliplr_image_deaugment",
    "fliplr_labels_deaugment",
    "flips_image_augment",
    "flips_labels_augment",
    "flips_image_deaugment",
    "flips_labels_deaugment",
    "flipud_image_augment",
    "flipud_image_deaugment",
    "flipud_labels_deaugment",
    "ms_image_augment",
    "ms_labels_augment",
    "ms_image_deaugment",
    "ms_labels_deaugment",
    "tencrop_image2label",
]

MaybeStrOrCallable = Optional[Union[str, Callable]]


def split_into_chunks(input: jnp.ndarray, num_chunks: int) -> Tuple[jnp.ndarray, ...]:
    if input.shape[0] % num_chunks != 0:
        raise RuntimeError(f"Cannot split batch of {input.shape[0]} into {num_chunks} equal TTA chunks.")
    return tuple(jnp.split(input, num_chunks, axis=0))


def _deaugment_averaging(x: jnp.ndarray, reduction: MaybeStrOrCallable) -> jnp.ndarray:
    """Reduce the TTA axis 0 of [T, B, ...] (reference tta.py:63-96)."""
    if reduction == "mean":
        return x.mean(axis=0)
    if reduction == "sum":
        return x.sum(axis=0)
    if reduction in {"gmean", "geometric_mean"}:
        return F.geometric_mean(x, axis=0)
    if reduction in {"hmean", "harmonic_mean"}:
        return F.harmonic_mean(x, axis=0)
    if reduction == "harmonic1p":
        return F.harmonic1p_mean(x, axis=0)
    if reduction == "logodd":
        return F.logodd_mean(x, axis=0)
    if reduction == "log1p":
        return F.log1p_mean(x, axis=0)
    if callable(reduction):
        return reduction(x, axis=0)
    if reduction in {None, "None", "none"}:
        return x
    raise KeyError(f"Unsupported reduction mode {reduction}")


# ---------------------------------------------------------------------------
# Crops (classification)
# ---------------------------------------------------------------------------


def fivecrop_image_augment(image: jnp.ndarray, crop_size: Tuple[int, int]) -> jnp.ndarray:
    """Four corner crops + center crop stacked along batch
    (reference tta.py:99-129). NHWC."""
    image_height, image_width = image.shape[1], image.shape[2]
    crop_height, crop_width = crop_size
    if crop_height > image_height:
        raise ValueError(f"Crop height {crop_height} exceeds the image height {image_height}")
    if crop_width > image_width:
        raise ValueError(f"Crop width {crop_width} exceeds the image width {image_width}")

    bottom = image_height - crop_height
    right = image_width - crop_width
    crop_tl = image[:, :crop_height, :crop_width, :]
    crop_tr = image[:, :crop_height, right:, :]
    crop_bl = image[:, bottom:, :crop_width, :]
    crop_br = image[:, bottom:, right:, :]
    cy = (image_height - crop_height) // 2
    cx = (image_width - crop_width) // 2
    crop_cc = image[:, cy : cy + crop_height, cx : cx + crop_width, :]
    return jnp.concatenate([crop_tl, crop_tr, crop_bl, crop_br, crop_cc], axis=0)


def fivecrop_label_deaugment(logits: jnp.ndarray, reduction: MaybeStrOrCallable = "mean") -> jnp.ndarray:
    return _deaugment_averaging(jnp.stack(split_into_chunks(logits, 5)), reduction)


def fivecrop_image2label(model_fn: Callable, image: jnp.ndarray, crop_size: Tuple[int, int]) -> jnp.ndarray:
    return fivecrop_label_deaugment(model_fn(fivecrop_image_augment(image, crop_size)))


def tencrop_image2label(model_fn: Callable, image: jnp.ndarray, crop_size: Tuple[int, int]) -> jnp.ndarray:
    """Five crops + their horizontal flips, averaged (reference tta.py:153-206).
    Unlike the reference's 10 sequential forwards, this is ONE batched forward."""
    crops5 = fivecrop_image_augment(image, crop_size)
    crops10 = jnp.concatenate([crops5, F.image_fliplr(crops5)], axis=0)
    output = model_fn(crops10)
    return _deaugment_averaging(jnp.stack(split_into_chunks(output, 10)), "mean")


# ---------------------------------------------------------------------------
# Flip family
# ---------------------------------------------------------------------------


def fliplr_image_augment(image: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([image, F.image_fliplr(image)], axis=0)


def flipud_image_augment(image: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([image, F.image_flipud(image)], axis=0)


def fliplr_image_deaugment(image: jnp.ndarray, reduction: MaybeStrOrCallable = "mean") -> jnp.ndarray:
    b1, b2 = split_into_chunks(image, 2)
    return _deaugment_averaging(jnp.stack([b1, F.image_fliplr(b2)]), reduction)


def flipud_image_deaugment(image: jnp.ndarray, reduction: MaybeStrOrCallable = "mean") -> jnp.ndarray:
    b1, b2 = split_into_chunks(image, 2)
    return _deaugment_averaging(jnp.stack([b1, F.image_flipud(b2)]), reduction)


def flips_image_augment(image: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([image, F.image_fliplr(image), F.image_flipud(image)], axis=0)


def flips_image_deaugment(image: jnp.ndarray, reduction: MaybeStrOrCallable = "mean") -> jnp.ndarray:
    orig, lr, ud = split_into_chunks(image, 3)
    return _deaugment_averaging(
        jnp.stack([orig, F.image_fliplr(lr), F.image_flipud(ud)]), reduction
    )


def fliplr_labels_augment(labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([labels] * 2, axis=0)


def flips_labels_augment(labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([labels] * 3, axis=0)


def fliplr_labels_deaugment(logits: jnp.ndarray, reduction: MaybeStrOrCallable = "mean") -> jnp.ndarray:
    return _deaugment_averaging(jnp.stack(split_into_chunks(logits, 2)), reduction)


def flipud_labels_deaugment(logits: jnp.ndarray, reduction: MaybeStrOrCallable = "mean") -> jnp.ndarray:
    return _deaugment_averaging(jnp.stack(split_into_chunks(logits, 2)), reduction)


def flips_labels_deaugment(logits: jnp.ndarray, reduction: MaybeStrOrCallable = "mean") -> jnp.ndarray:
    return _deaugment_averaging(jnp.stack(split_into_chunks(logits, 3)), reduction)


def fliplr_image2label(model_fn: Callable, image: jnp.ndarray) -> jnp.ndarray:
    return fliplr_labels_deaugment(model_fn(fliplr_image_augment(image)))


def fliplr_image2mask(model_fn: Callable, image: jnp.ndarray) -> jnp.ndarray:
    return fliplr_image_deaugment(model_fn(fliplr_image_augment(image)))


# ---------------------------------------------------------------------------
# D2 family
# ---------------------------------------------------------------------------


def d2_image_augment(image: jnp.ndarray) -> jnp.ndarray:
    """[B] -> [4B]: identity, fliplr, flipud, fliplr+flipud
    (reference tta.py:319-341)."""
    return jnp.concatenate(
        [
            image,
            F.image_fliplr(image),
            F.image_flipud(image),
            F.image_fliplr(F.image_flipud(image)),
        ],
        axis=0,
    )


def d2_image_deaugment(image: jnp.ndarray, reduction: MaybeStrOrCallable = "mean") -> jnp.ndarray:
    b1, b2, b3, b4 = split_into_chunks(image, 4)
    return _deaugment_averaging(
        jnp.stack(
            [b1, F.image_fliplr(b2), F.image_flipud(b3), F.image_flipud(F.image_fliplr(b4))]
        ),
        reduction,
    )


def d2_labels_augment(labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([labels] * 4, axis=0)


def d2_labels_deaugment(logits: jnp.ndarray, reduction: MaybeStrOrCallable = "mean") -> jnp.ndarray:
    return _deaugment_averaging(jnp.stack(split_into_chunks(logits, 4)), reduction)


# ---------------------------------------------------------------------------
# D4 family
# ---------------------------------------------------------------------------


def d4_image_augment(image: jnp.ndarray) -> jnp.ndarray:
    """[B] -> [8B]: rotations of the image and of its transpose
    (reference tta.py:385-422). Input must be square."""
    if image.shape[1] != image.shape[2]:
        raise ValueError(f"d4 TTA needs square spatial dims (H == W); got shape {image.shape}")
    image_t = F.image_transpose(image)
    return jnp.concatenate(
        [
            image,
            F.image_rot90_cw(image),
            F.image_rot180(image),
            F.image_rot90_ccw(image),
            image_t,
            F.image_rot90_cw(image_t),
            F.image_rot180(image_t),
            F.image_rot90_ccw(image_t),
        ],
        axis=0,
    )


def d4_image_deaugment(image: jnp.ndarray, reduction: MaybeStrOrCallable = "mean") -> jnp.ndarray:
    b1, b2, b3, b4, b5, b6, b7, b8 = split_into_chunks(image, 8)
    return _deaugment_averaging(
        jnp.stack(
            [
                b1,
                F.image_rot90_ccw(b2),
                F.image_rot180(b3),
                F.image_rot90_cw(b4),
                F.image_transpose(b5),
                F.image_rot90_ccw_transpose(b6),
                F.image_rot180_transpose(b7),
                F.image_rot90_cw_transpose(b8),
            ]
        ),
        reduction,
    )


def d4_image_augment_views(image: jnp.ndarray, views: Tuple[int, ...]) -> jnp.ndarray:
    """[B] -> [len(views)*B]: a SUBSET of the 8 d4 views, in d4 index order
    (0=identity, 1=rot90cw, 2=rot180, 3=rot90ccw, 4..7 = same of transpose).
    Unused transforms are dead code under jit, so requesting 2 views costs 2
    transforms, not 8."""
    if image.shape[1] != image.shape[2]:
        raise ValueError(f"d4 TTA needs square spatial dims (H == W); got shape {image.shape}")
    image_t = F.image_transpose(image)
    aug = (
        lambda: image,
        lambda: F.image_rot90_cw(image),
        lambda: F.image_rot180(image),
        lambda: F.image_rot90_ccw(image),
        lambda: image_t,
        lambda: F.image_rot90_cw(image_t),
        lambda: F.image_rot180(image_t),
        lambda: F.image_rot90_ccw(image_t),
    )
    return jnp.concatenate([aug[v]() for v in views], axis=0)


_D4_DEAUG = (
    lambda b: b,
    lambda b: F.image_rot90_ccw(b),
    lambda b: F.image_rot180(b),
    lambda b: F.image_rot90_cw(b),
    lambda b: F.image_transpose(b),
    lambda b: F.image_rot90_ccw_transpose(b),
    lambda b: F.image_rot180_transpose(b),
    lambda b: F.image_rot90_cw_transpose(b),
)


def d4_image_deaugment_views(
    image: jnp.ndarray, views: Tuple[int, ...], reduction: MaybeStrOrCallable = "mean"
) -> jnp.ndarray:
    """Inverse of :func:`d4_image_augment_views` + reduction over the views."""
    chunks = split_into_chunks(image, len(views))
    return _deaugment_averaging(
        jnp.stack([_D4_DEAUG[v](chunk) for v, chunk in zip(views, chunks)]), reduction
    )


def d4_labels_augment(labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([labels] * 8, axis=0)


def d4_labels_deaugment(logits: jnp.ndarray, reduction: MaybeStrOrCallable = "mean") -> jnp.ndarray:
    return _deaugment_averaging(jnp.stack(split_into_chunks(logits, 8)), reduction)


def d4_image2label(model_fn: Callable, image: jnp.ndarray) -> jnp.ndarray:
    return d4_labels_deaugment(model_fn(d4_image_augment(image)))


def d4_image2mask(model_fn: Callable, image: jnp.ndarray) -> jnp.ndarray:
    return d4_image_deaugment(model_fn(d4_image_augment(image)))


# ---------------------------------------------------------------------------
# Multi-scale family
# ---------------------------------------------------------------------------


def ms_labels_augment(labels: jnp.ndarray, size_offsets: List) -> List[jnp.ndarray]:
    return [labels] * len(size_offsets)


def ms_image_augment(
    image: jnp.ndarray,
    size_offsets: List[Union[int, Tuple[int, int]]],
    mode: str = "bilinear",
    align_corners: bool = False,
) -> List[jnp.ndarray]:
    """List of resized tensors, one per size offset (reference tta.py:599-621)."""
    rows, cols = image.shape[1], image.shape[2]
    augmented = []
    for offset in size_offsets:
        if isinstance(offset, (tuple, list)):
            r_off, c_off = offset
        else:
            r_off, c_off = offset, offset
        if r_off == 0 and c_off == 0:
            augmented.append(image)
        else:
            augmented.append(
                resize_2d(image, (rows + r_off, cols + c_off), mode=mode, align_corners=align_corners)
            )
    return augmented


def ms_labels_deaugment(
    logits: List[jnp.ndarray],
    size_offsets: List,
    reduction: MaybeStrOrCallable = "mean",
) -> jnp.ndarray:
    if len(logits) != len(size_offsets):
        raise ValueError("Got a different number of images than size offsets")
    return _deaugment_averaging(jnp.stack(logits), reduction)


def ms_image_deaugment(
    images: List[jnp.ndarray],
    size_offsets: List[Union[int, Tuple[int, int]]],
    reduction: MaybeStrOrCallable = "mean",
    mode: str = "bilinear",
    align_corners: bool = True,
    stride: int = 1,
) -> jnp.ndarray:
    """Resize per-scale outputs back to the original size and reduce
    (reference tta.py:645-689)."""
    if len(images) != len(size_offsets):
        raise ValueError("Got a different number of images than size offsets")

    deaugmented = []
    for feature_map, offset in zip(images, size_offsets):
        if isinstance(offset, (tuple, list)):
            r_off, c_off = offset
        else:
            r_off, c_off = offset, offset
        if r_off == 0 and c_off == 0:
            deaugmented.append(feature_map)
        else:
            rows, cols = feature_map.shape[1], feature_map.shape[2]
            original = (rows - r_off // stride, cols - c_off // stride)
            deaugmented.append(resize_2d(feature_map, original, mode=mode, align_corners=align_corners))
    return _deaugment_averaging(jnp.stack(deaugmented), reduction)


# ---------------------------------------------------------------------------
# Model wrappers
# ---------------------------------------------------------------------------


class GeneralizedTTA:
    """Wrap a model callable with augment/deaugment functions
    (reference tta.py:692-756).

    augment_fn / deaugment_fn may be a callable, a dict (multi-input /
    multi-output by key) or a list (positional).
    """

    def __init__(
        self,
        model_fn: Callable,
        augment_fn: Union[Callable, Dict[str, Callable], List[Callable]],
        deaugment_fn: Union[Callable, Dict[str, Callable], List[Callable]],
    ):
        self.model_fn = model_fn
        self.augment_fn = augment_fn
        self.deaugment_fn = deaugment_fn

    def __call__(self, *input, **kwargs):
        if isinstance(self.augment_fn, dict):
            if len(input) != 0:
                raise ValueError(
                    "GeneralizedTTA with a dict augment_fn takes keyword inputs only"
                )
            augmented_inputs = {key: augment(kwargs[key]) for key, augment in self.augment_fn.items()}
            outputs = self.model_fn(**augmented_inputs)
        elif isinstance(self.augment_fn, (list, tuple)):
            if len(kwargs) != 0:
                raise ValueError("GeneralizedTTA expects a single tensor input here")
            augmented_inputs = [augment(x) for x, augment in zip(input, self.augment_fn)]
            outputs = self.model_fn(*augmented_inputs)
        else:
            if len(input) != 1 or len(kwargs) != 0:
                raise ValueError("GeneralizedTTA expects a single tensor input here")
            outputs = self.model_fn(self.augment_fn(input[0]))

        if isinstance(self.deaugment_fn, dict):
            if not isinstance(outputs, dict):
                raise ValueError("A dict deaugment_fn needs the model to return a dict")
            return {key: fn(outputs[key]) for key, fn in self.deaugment_fn.items()}
        if isinstance(self.deaugment_fn, (list, tuple)):
            if not isinstance(outputs, (dict, tuple, list)):
                raise ValueError("A list deaugment_fn needs the model to return a dict/list/tuple")
            return [fn(value) for value, fn in zip(outputs, self.deaugment_fn)]
        return self.deaugment_fn(outputs)


class MultiscaleTTA:
    """Run the model at several scales and average de-scaled outputs
    (reference tta.py:759-801)."""

    def __init__(
        self,
        model_fn: Callable,
        size_offsets: List[int],
        mode: str = "bilinear",
        align_corners: bool = False,
        augment_fn: Callable = ms_image_augment,
        deaugment_fn: Union[Callable, Dict[str, Callable]] = ms_image_deaugment,
    ):
        self.model_fn = model_fn
        self.size_offsets = size_offsets
        self.mode = mode
        self.align_corners = align_corners
        self.augment_fn = augment_fn
        self.deaugment_fn = deaugment_fn
        self.keys = set(deaugment_fn.keys()) if isinstance(deaugment_fn, dict) else None

    def __call__(self, x):
        ms_inputs = self.augment_fn(
            x, size_offsets=self.size_offsets, mode=self.mode, align_corners=self.align_corners
        )
        ms_outputs = [self.model_fn(xi) for xi in ms_inputs]
        if self.keys is None:
            return self.deaugment_fn(ms_outputs, self.size_offsets)
        outputs = {}
        for key in self.keys:
            values = [out[key] for out in ms_outputs]
            outputs[key] = self.deaugment_fn[key](values, size_offsets=self.size_offsets)
        return outputs


class TTAWrapper:
    """Deprecated partial-application wrapper (reference tta.py:584-592).
    Use GeneralizedTTA instead."""

    def __init__(self, model_fn: Callable, tta_function: Callable, **kwargs):
        import warnings

        warnings.warn(
            "TTAWrapper is deprecated. Please use GeneralizedTTA instead",
            DeprecationWarning,
            stacklevel=2,
        )
        self.model_fn = model_fn
        self.tta = partial(tta_function, **kwargs)

    def __call__(self, *input):
        return self.tta(self.model_fn, *input)
