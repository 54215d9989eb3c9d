"""Test configuration.

Runs the suite on CPU with 8 virtual XLA devices so multi-chip sharding
(Mesh/pjit) is exercised without TPU hardware — the JAX-native answer to
testing distributed paths that the torch reference never had.

Two tiers: the default FAST tier (~10-11 min cold on this 1-core box,
load-dependent; XLA compiles dominate) proves every contract with
minimal-depth configs and depth-reduced parity twins; ``-m slow`` adds the
full presets, full meshes, and exhaustive sweeps.

Also exposes the torch reference (mounted read-only at /root/reference) for
numerical parity tests, shimming the torchvision import its utils package
pulls in (we only need pytorch_toolbelt.losses / inference).
"""

import os
import sys
import types

# Must happen before any jax computation. NOTE: this image's sitecustomize
# registers the axon TPU backend at interpreter boot and overrides
# JAX_PLATFORMS from the environment, so we must force CPU through
# jax.config, not env vars.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# This box has a single (shared) CPU core and the suite is dominated by XLA
# CPU compiles; turning off backend optimization halves compile time without
# changing numerics (fast-math stays off — parity oracles still hold).
if "xla_backend_optimization_level" not in flags:
    flags += " --xla_backend_optimization_level=0 --xla_llvm_disable_expensive_passes=true"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for sharding tests"

# Persistent compilation cache: this box has ONE cpu core, so XLA compiles
# dominate suite runtime; caching them across runs (and across pytest
# processes) is the difference between minutes and tens of minutes.
_cache_dir = os.environ.get("JAX_TEST_CACHE_DIR", "/tmp/ptb_tpu_jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

REFERENCE_PATH = "/root/reference"
_reference_available = None


def reference_available() -> bool:
    """True if the torch reference implementation can be imported."""
    global _reference_available
    if _reference_available is None:
        try:
            import torch  # noqa: F401

            if "torchvision" not in sys.modules and os.path.isdir(REFERENCE_PATH):
                # Minimal shim: reference utils imports torchvision.ops.box_iou.
                tv = types.ModuleType("torchvision")
                tv_ops = types.ModuleType("torchvision.ops")

                def box_iou(boxes1, boxes2):
                    import torch

                    area1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
                    area2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
                    lt = torch.max(boxes1[:, None, :2], boxes2[None, :, :2])
                    rb = torch.min(boxes1[:, None, 2:], boxes2[None, :, 2:])
                    wh = (rb - lt).clamp(min=0)
                    inter = wh[..., 0] * wh[..., 1]
                    return inter / (area1[:, None] + area2[None, :] - inter)

                tv_ops.box_iou = box_iou
                tv.ops = tv_ops

                # pytorch_toolbelt.modules.encoders.* import torchvision.models
                # symbols at module import time; a __getattr__ placeholder lets
                # the package import so the VENDORED backbones (which need no
                # torchvision) are reachable for parity tests.
                tv_models = types.ModuleType("torchvision.models")

                def _missing_model(name):
                    if name.startswith("__"):
                        # inspect.getmodule & friends probe __file__/__spec__
                        # on every sys.modules entry; answering with a
                        # function breaks them — dunders must miss honestly
                        raise AttributeError(name)

                    def unavailable(*args, **kwargs):
                        raise RuntimeError(f"torchvision.models.{name} is not available in tests")

                    return unavailable

                tv_models.__getattr__ = _missing_model
                tv.models = tv_models
                sys.modules["torchvision"] = tv
                sys.modules["torchvision.ops"] = tv_ops
                sys.modules["torchvision.models"] = tv_models

            if "timm" not in sys.modules and os.path.isdir(REFERENCE_PATH):
                # reference encoders/swin.py needs three small timm.models.layers
                # helpers at import time
                import collections.abc
                import itertools

                import torch as _torch

                timm = types.ModuleType("timm")
                timm_models = types.ModuleType("timm.models")
                timm_layers = types.ModuleType("timm.models.layers")

                def to_2tuple(x):
                    if isinstance(x, collections.abc.Iterable) and not isinstance(x, str):
                        return tuple(x)
                    return tuple(itertools.repeat(x, 2))

                def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
                    with _torch.no_grad():
                        tensor.normal_(mean, std).clamp_(min=a * std + mean, max=b * std + mean)
                    return tensor

                class DropPath(_torch.nn.Module):
                    def __init__(self, drop_prob=0.0, scale_by_keep=True):
                        super().__init__()
                        self.drop_prob = float(drop_prob or 0.0)
                        self.scale_by_keep = scale_by_keep

                    def forward(self, x):
                        if self.drop_prob == 0.0 or not self.training:
                            return x
                        keep = 1.0 - self.drop_prob
                        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                        mask = x.new_empty(shape).bernoulli_(keep)
                        if self.scale_by_keep:
                            mask.div_(keep)
                        return x * mask

                timm_layers.to_2tuple = to_2tuple
                timm_layers.trunc_normal_ = trunc_normal_
                timm_layers.DropPath = DropPath
                timm_models.layers = timm_layers
                timm.models = timm_models
                sys.modules["timm"] = timm
                sys.modules["timm.models"] = timm_models
                sys.modules["timm.models.layers"] = timm_layers

            if REFERENCE_PATH not in sys.path and os.path.isdir(REFERENCE_PATH):
                sys.path.append(REFERENCE_PATH)
            import pytorch_toolbelt.losses  # noqa: F401

            _reference_available = True
        except Exception:
            _reference_available = False
    return _reference_available
