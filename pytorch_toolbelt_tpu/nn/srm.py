"""Style-based Recalibration Module (reference: modules/srm.py:5-32)."""

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["SRMLayer"]


class SRMLayer(nn.Module):
    """Style pooling (mean/std per channel) -> per-channel linear style
    integration -> BN -> sigmoid gate."""

    @nn.compact
    def __call__(self, x, training: bool = False):
        b, h, w, c = x.shape
        flat = x.reshape(b, h * w, c)
        mean = flat.mean(axis=1)
        std = flat.std(axis=1, ddof=1)
        u = jnp.stack([mean, std], axis=-1)  # [B, C, 2]

        # per-channel style integration: grouped 1D conv over the 2 stats
        cfc = self.param("cfc", nn.initializers.lecun_normal(), (c, 2))
        z = jnp.sum(u * cfc[None], axis=-1)  # [B, C]
        z = nn.BatchNorm(use_running_average=not training)(z)
        g = jax.nn.sigmoid(z)
        return x * g[:, None, None, :]
