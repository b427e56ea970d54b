"""Multi-chip data-parallel ray tracing and optimization on a device mesh.

Run: python examples/05_multichip.py
Uses 8 virtual CPU devices when real chips are unavailable; the exact same
code scales over a real TPU pod slice (rays sharded on the 'rays' axis,
lens parameters replicated, gradients psum-reduced by XLA).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

if jax.default_backend() == "cpu" and len(jax.devices()) < 2:
    raise SystemExit("rerun with XLA_FLAGS=--xla_force_host_platform_device_count=8")

import jax.numpy as jnp
import numpy as np
import optax

from optiland_tpu.analysis.spot import spot_coordinates
from optiland_tpu.parallel.mesh import make_mesh, ray_sharding, replicated
from optiland_tpu.samples import CookeTriplet


def main():
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    print(f"mesh: {mesh} over {n_dev} {jax.default_backend()} devices")

    lens = CookeTriplet()
    system = jax.device_put(lens.system, replicated(mesh))

    # a 64k-ray bundle sharded across the mesh
    n = 8192 * n_dev
    rng = np.random.default_rng(0)
    r, th = np.sqrt(rng.uniform(size=n)), rng.uniform(0, 2 * np.pi, n)
    sh = ray_sharding(mesh)
    Px = jax.device_put(jnp.asarray(r * np.cos(th)), sh)
    Py = jax.device_put(jnp.asarray(r * np.sin(th)), sh)
    Hx = jax.device_put(jnp.zeros(n), sh)
    Hy = jax.device_put(jnp.full(n, 0.7), sh)

    def merit(stack):
        sys2 = system.replace(stack=stack)
        x, y, _ = spot_coordinates(sys2, Hx, Hy, Px, Py, 0.55)
        return jnp.mean((x - jnp.mean(x)) ** 2 + (y - jnp.mean(y)) ** 2)

    opt = optax.adam(1e-3)

    @jax.jit
    def step(stack, opt_state):
        loss, grads = jax.value_and_grad(merit)(stack)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads
        )
        updates, opt_state = opt.update(grads, opt_state, stack)
        return optax.apply_updates(stack, updates), opt_state, loss

    stack = system.stack
    opt_state = opt.init(stack)
    for i in range(20):
        stack, opt_state, loss = step(stack, opt_state)
        if i % 5 == 0:
            print(f"step {i:3d}: sharded RMS^2 merit = {float(loss):.6e}")
    print("done — XLA inserted the cross-device psum for the mean/grads")

    # ---- the production optimizer step: sharded FUSED merit kernels ----
    # Each device runs the fused Pallas merit kernels on its ray shard;
    # only per-tile Chan statistics cross the mesh (all_gather) and the
    # parameter cotangents psum — O(tiles) of ICI traffic per step. On
    # TPU pass num_rays=... instead of Px/Py and the pupil samples are
    # drawn in-kernel (each shard offsets the PRNG sub-block stream so
    # the mesh jointly draws the single-device sample set). A singlet
    # keeps the CPU interpret-mode compile of this demo short; on TPU the
    # same call handles the full system (docs/PROFILE.md table).
    from optiland_tpu.optic import Optic
    from optiland_tpu.parallel.sharded_trace import (
        spot_rms_fast_field_sharded,
    )

    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, radius=60.0, thickness=4.0, material="N-BK7",
                   is_stop=True)
    o.surfaces.add(index=2, radius=-120.0, thickness=50.0)
    o.surfaces.add(index=3)
    o.set_aperture("EPD", 20.0)
    o.fields.set_type("angle")
    o.fields.add(y=0)
    o.wavelengths.add(0.55, is_primary=True)
    singlet = jax.device_put(o.system, replicated(mesh))

    def fused_merit(stack):
        return spot_rms_fast_field_sharded(
            singlet.replace(stack=stack), 0.0, 0.7, 0.55,
            Px=Px, Py=Py, mesh=mesh, newton_iters=1,
        )

    loss, grads = jax.value_and_grad(fused_merit)(singlet.stack)
    g = np.asarray(grads.radius)
    print(
        f"fused sharded merit: loss={float(loss):.6e}, "
        f"|dL/dR|max={np.abs(g[1:-1]).max():.3e}"
    )


if __name__ == "__main__":
    main()
