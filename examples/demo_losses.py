"""Loss-landscape demo (capability target: reference demo/demo_losses.py).

Plots each binary segmentation loss — value, FIRST derivative (exact, via
jax.grad, where the reference resorts to np.gradient finite differences)
and second derivative — as the logit sweeps [-5, 5] against an all-ones
target.  Saves a PNG instead of plt.show() (headless-friendly).

Run: python examples/demo_losses.py [out.png]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_toolbelt_tpu import losses as L


def main(out_path: str = "losses_demo.png", n_points: int = 200):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    bce = L.SoftBCEWithLogitsLoss()
    losses = {
        "bce": bce,
        "focal": L.BinaryFocalLoss(),
        "jaccard": L.JaccardLoss(mode="binary"),
        "dice": L.DiceLoss(mode="binary"),
        "lovasz": L.BinaryLovaszLoss(),
        "bce+lovasz": L.JointLoss(bce, L.BinaryLovaszLoss()),
        "reduced_focal": L.BinaryFocalLoss(reduced_threshold=0.5),
    }

    xs = np.linspace(-5, 5, n_points).astype(np.float32)
    target = jnp.ones((100,), jnp.float32)

    fig, ax = plt.subplots(3, figsize=(16, 16))
    for name, loss in losses.items():
        scalar = lambda x: jnp.asarray(loss(jnp.full((100,), x), target)).sum()
        value = jax.jit(scalar)
        grad = jax.jit(jax.grad(scalar))
        grad2 = jax.jit(jax.grad(lambda x: jax.grad(scalar)(x)))
        ys = [float(value(x)) for x in xs]
        dys = [float(grad(x)) for x in xs]
        d2ys = [float(grad2(x)) for x in xs]
        ax[0].plot(xs, ys, label=name)
        ax[1].plot(xs, dys, label=name)
        ax[2].plot(xs, d2ys, label=name)

    ax[0].set_title("loss value")
    ax[1].set_title("d loss / d logit (exact, jax.grad)")
    ax[2].set_title("d2 loss / d logit2")
    fig.legend(*ax[0].get_legend_handles_labels())
    fig.savefig(out_path, dpi=72)
    print(f"saved {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
