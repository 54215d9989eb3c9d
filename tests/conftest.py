"""Test configuration.

Runs the suite on CPU with 8 virtual XLA devices so multi-chip sharding
(Mesh/pjit) is exercised without TPU hardware — the JAX-native answer to
testing distributed paths that the torch reference never had.

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
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for sharding tests"

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
                sys.modules["torchvision"] = tv
                sys.modules["torchvision.ops"] = tv_ops

            if REFERENCE_PATH not in sys.path and os.path.isdir(REFERENCE_PATH):
                sys.path.append(REFERENCE_PATH)
            import pytorch_toolbelt.losses  # noqa: F401

            _reference_available = True
        except Exception:
            _reference_available = False
    return _reference_available
