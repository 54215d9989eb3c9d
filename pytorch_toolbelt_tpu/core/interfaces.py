"""Model-building contracts for encoder/decoder/head composition.

TPU-native restatement of the reference contract
(reference: pytorch_toolbelt/modules/interfaces.py:22-126):

* an *encoder* maps an image batch to a list of feature maps ordered
  fine -> coarse,
* a *decoder* maps that list to a new list of feature maps,
* a *head* maps the list to the task output (array / tuple / dict).

Feature maps are NHWC (channels last) — the layout XLA:TPU prefers for
convolutions.  Because everything runs under ``jax.jit`` with static shapes,
the reference's runtime ``output_size`` hints become static attributes.
"""

from __future__ import annotations

import dataclasses
from typing import List, Protocol, Sequence, Tuple, runtime_checkable

import jax.numpy as jnp
import numpy as np

__all__ = [
    "FeatureMapsSpec",
    "FeatureMapsSpecification",  # alias matching reference spelling
    "HasOutputFeaturesSpecification",
    "AbstractDecoder",
    "AbstractHead",
]


@dataclasses.dataclass(frozen=True)
class FeatureMapsSpec:
    """(channels, strides) description of a feature pyramid.

    Mirrors the behavioral contract of the reference
    ``FeatureMapsSpecification`` (pytorch_toolbelt/modules/interfaces.py:22-55)
    but produces NHWC dummy inputs.
    """

    channels: Tuple[int, ...]
    strides: Tuple[int, ...]

    def __init__(self, channels: Sequence[int], strides: Sequence[int]):
        if len(channels) != len(strides):
            raise ValueError(
                f"Length of channels ({len(channels)}) must be equal to "
                f"length of strides ({len(strides)})"
            )
        object.__setattr__(self, "channels", tuple(int(c) for c in channels))
        object.__setattr__(self, "strides", tuple(int(s) for s in strides))

    def get_index_of_largest_feature_map(self) -> int:
        """0-based index of the spatially largest map (smallest stride)."""
        return int(np.argmin(self.strides))

    def get_dummy_input(self, image_size: Tuple[int, int] = (640, 512), dtype=jnp.float32) -> List[jnp.ndarray]:
        """List of zero NHWC feature maps matching this spec (batch of 1)."""
        rows, cols = image_size
        return [
            jnp.zeros((1, rows // s, cols // s, c), dtype=dtype)
            for c, s in zip(self.channels, self.strides)
        ]

    def __len__(self) -> int:
        return len(self.channels)


# The reference spells it out in full; keep an alias so users migrating from
# pytorch-toolbelt find the familiar name.
FeatureMapsSpecification = FeatureMapsSpec


@runtime_checkable
class HasOutputFeaturesSpecification(Protocol):
    """Anything that can describe its output feature pyramid (reference
    interfaces.py:58-66).  flax modules satisfy this structurally — no
    inheritance needed; ``isinstance`` works via ``runtime_checkable``."""

    def get_output_spec(self) -> FeatureMapsSpec: ...


@runtime_checkable
class AbstractDecoder(HasOutputFeaturesSpecification, Protocol):
    """Decoder contract: list of feature maps -> list of feature maps
    (reference interfaces.py:84-103).  The reference expresses this as an
    abstract nn.Module base; with flax the contract is structural — every
    decoder in ``zoo.decoders`` satisfies it."""

    def __call__(self, feature_maps: Sequence[jnp.ndarray]) -> List[jnp.ndarray]: ...


@runtime_checkable
class AbstractHead(HasOutputFeaturesSpecification, Protocol):
    """Head contract: list of feature maps -> task output (reference
    interfaces.py:106-126)."""

    def __call__(self, feature_maps: Sequence[jnp.ndarray]): ...
