"""Interactive 3D system viewer: standalone WebGL export.

Generates a self-contained .html page for the Cooke triplet and the
Hubble telescope — open either in any browser (no server, no deps):

  * left-drag orbits the camera, wheel zooms, right-drag pans
  * click a lens/mirror surface to pick it — an overlay shows its
    index, type, radius, conic, thickness, material, and stop flag
  * "R" resets the camera

This is the capability analog of the reference's VTK viewer
(optiland/visualization/system/optic_viewer_3d.py) re-hosted as a
dependency-free WebGL page; the scene (meshes + traced ray polylines)
is embedded as plain JSON, so the export doubles as a machine-readable
scene dump.

Run: python examples/12_interactive_3d.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

from optiland_tpu.samples import CookeTriplet, HubbleTelescope  # noqa: E402

out_dir = os.path.join(os.path.dirname(__file__), "_output")
os.makedirs(out_dir, exist_ok=True)

cooke_path = CookeTriplet().draw3D_interactive(
    path=os.path.join(out_dir, "cooke_3d.html"), num_rays=24
)
print(f"Cooke triplet viewer:    {cooke_path}")

hubble_path = HubbleTelescope().draw3D_interactive(
    path=os.path.join(out_dir, "hubble_3d.html"), num_rays=24
)
print(f"Hubble telescope viewer: {hubble_path}")
print("Open either file in a browser; click a surface to inspect it.")
