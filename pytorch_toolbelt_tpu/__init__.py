"""pytorch-toolbelt-tpu: a TPU-native (JAX/XLA/Pallas) framework with the
capability surface of BloodAxe/pytorch-toolbelt.

Layers (see SURVEY.md):
  core/         model-building contracts, deprecation, registries
  nn/           Flax building blocks (activations, norm, conv, attention, pooling, upsample)
  zoo/          encoders / decoders / heads / backbones
  losses/       segmentation & classification losses (pure JAX, custom VJPs)
  inference/    tiled huge-image inference, TTA, ensembling (Pallas tile merger)
  ops/          Pallas TPU kernels
  optimization/ LR schedules + param-group builders (optax)
  datasets/     sample-dict keys, wrappers, streaming mean/std
  utils/        fs / rle / random / visualization / bbox matching
  distributed/  jax.sharding Mesh helpers (DP/spatial tile parallelism)
"""

__version__ = "0.1.0"

from . import core, datasets, distributed, inference, losses, nn, ops, optimization, utils, zoo

__all__ = [
    "core",
    "datasets",
    "distributed",
    "inference",
    "losses",
    "nn",
    "ops",
    "optimization",
    "utils",
    "zoo",
    "__version__",
]
