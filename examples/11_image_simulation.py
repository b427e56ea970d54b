"""Image simulation: spatially-variant PSF blur + distortion warp of a
synthetic scene through a fast achromat.

Run: python examples/11_image_simulation.py
(reference: optiland/analysis/image_simulation/engine.py)
"""

import os

os.environ.setdefault("MPLBACKEND", "Agg")

import jax

jax.config.update("jax_platforms", "cpu")

import matplotlib.pyplot as plt
import numpy as np

from optiland_tpu.analysis import ImageSimulationEngine
from optiland_tpu.samples import CookeTriplet


def checker_scene(n=96, squares=8):
    """RGB checkerboard with a bright cross — shows blur and distortion."""
    idx = np.arange(n)
    cells = (idx[:, None] // (n // squares) + idx[None, :] // (n // squares))
    board = (cells % 2).astype(float)
    img = np.stack([board, 1 - board, np.full_like(board, 0.5)], axis=-1)
    img[n // 2 - 1 : n // 2 + 1, :, :] = 1.0
    img[:, n // 2 - 1 : n // 2 + 1, :] = 1.0
    return img


def main():
    lens = CookeTriplet()
    scene = checker_scene()

    engine = ImageSimulationEngine(
        lens,
        scene,
        config={
            "psf_grid_shape": (3, 3),
            "psf_size": 32,
            "num_rays": 24,
            "n_components": 2,
            "padding": 16,
        },
    )
    out = engine.run()
    out = np.asarray(out)
    print(f"simulated image: shape {out.shape}, "
          f"range [{out.min():.3f}, {out.max():.3f}]")

    fig, axes = plt.subplots(1, 2, figsize=(8, 4))
    axes[0].imshow(scene)
    axes[0].set_title("scene")
    disp = out if out.ndim == 3 and out.shape[-1] == 3 else out.squeeze()
    axes[1].imshow(np.clip(disp, 0, 1))
    axes[1].set_title("through the Cooke triplet")
    for ax in axes:
        ax.set_axis_off()
    fig.savefig("/tmp/image_simulation.png", dpi=110)
    print("saved /tmp/image_simulation.png")
    plt.close("all")


if __name__ == "__main__":
    main()
