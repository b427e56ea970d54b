"""Benchmark: forward+backward ray-trace throughput on the Cooke triplet.

Prints one JSON line:
  {"metric": "rays_surfaces_per_sec_fwdbwd", "value": N, "unit": "ray-surf/s",
   "vs_baseline": N / 2e8}

The baseline 2e8 is the reference's best published number (150-200 M
ray-surfaces/s on GPU, reference docs/functionalities.rst:112). The driver
target (BASELINE.json) is >1e9/chip fwd+bwd.

Uses the fused Pallas trace kernels (forward + in-kernel-VJP backward) when
the system structure supports them, falling back to the XLA path otherwise.
Runs in float32 on the available accelerator (float64 is software-emulated
on TPU; parity suites use x64 on CPU instead). Pupil samples are generated
on-device (host transfers over tunneled TPU links are slow).
"""

from __future__ import annotations

import json
import os
import time

os.environ["OPTILAND_TPU_X64"] = "0"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from optiland_tpu.core import raygen, trace as xla_trace  # noqa: E402
from optiland_tpu.ops.pallas_trace import pallas_supported, trace_fast  # noqa: E402
from optiland_tpu.samples import CookeTriplet  # noqa: E402

NUM_RAYS = int(os.environ.get("BENCH_RAYS", 16_000_000))
ITERS = int(os.environ.get("BENCH_ITERS", 8))
# BENCH_MESH=N: shard rays over an N-device mesh (shard_map around the
# Pallas kernel; psum'd parameter gradients). N must divide the local
# device count; defaults to single-device.
MESH_N = int(os.environ.get("BENCH_MESH", 0))
WAVELENGTH = 0.55


def main():
    lens = CookeTriplet()
    system = lens.system
    num_traced_surfaces = system.cfg.num_surfaces - 1
    on_tpu = jax.default_backend() != "cpu"
    use_pallas = pallas_supported(system) and on_tpu
    mesh = None
    if MESH_N:
        from optiland_tpu.parallel.mesh import make_mesh, replicated

        mesh = make_mesh(MESH_N)
        system = jax.device_put(system, replicated(mesh))

    def gen(key, sys_):
        k1, k2 = jax.random.split(key)
        r = jnp.sqrt(jax.random.uniform(k1, (NUM_RAYS,), jnp.float32))
        th = jax.random.uniform(k2, (NUM_RAYS,), jnp.float32, 0, 2 * np.pi)
        Px = r * jnp.cos(th)
        Py = r * jnp.sin(th)
        H = jnp.zeros_like(Px)
        return raygen.generate_rays(
            sys_, H, jnp.full_like(Px, 0.7), Px, Py, WAVELENGTH
        )

    def final_xy(sys_, rays_):
        if use_pallas and mesh is not None:
            from optiland_tpu.parallel.sharded_trace import trace_fast_sharded

            out = trace_fast_sharded(sys_, rays_, WAVELENGTH, mesh=mesh)
        elif use_pallas:
            out = trace_fast(sys_, rays_, WAVELENGTH)
        else:
            out, _ = xla_trace.trace(sys_, rays_, record=False)
        return out.x, out.y

    # End-to-end step: on-device ray generation + trace (+ merit/grad).
    # Inputs vary per iteration (PRNG key) so no execution/result caching
    # layer between host and device can shortcut the measurement.
    def merit(key, stack):
        sys_ = system.replace(stack=stack)
        x, y = final_xy(sys_, gen(key, sys_))
        return jnp.mean((x - jnp.mean(x)) ** 2 + (y - jnp.mean(y)) ** 2)

    fwdbwd = jax.jit(jax.value_and_grad(merit, argnums=1))
    fwd = jax.jit(
        lambda key, stack: final_xy(
            system.replace(stack=stack), gen(key, system.replace(stack=stack))
        )
    )

    keys = [jax.random.PRNGKey(k) for k in range(2 * ITERS + 2)]
    v, g = fwdbwd(keys[-1], system.stack)
    jax.block_until_ready((v, g))
    jax.block_until_ready(fwd(keys[-2], system.stack))

    ts = []
    for k in range(ITERS):
        t0 = time.perf_counter()
        v, g = fwdbwd(keys[k], system.stack)
        jax.block_until_ready((v, g))
        ts.append(time.perf_counter() - t0)
    t_fwdbwd = float(np.median(ts))

    ts = []
    for k in range(ITERS):
        t0 = time.perf_counter()
        o = fwd(keys[ITERS + k], system.stack)
        jax.block_until_ready(o)
        ts.append(time.perf_counter() - t0)
    t_fwd = float(np.median(ts))

    rs_fwdbwd = NUM_RAYS * num_traced_surfaces / t_fwdbwd
    rs_fwd = NUM_RAYS * num_traced_surfaces / t_fwd

    print(
        json.dumps(
            {
                "metric": "rays_surfaces_per_sec_fwdbwd",
                "value": rs_fwdbwd,
                "unit": "ray-surf/s",
                "vs_baseline": rs_fwdbwd / 2e8,
                "extra": {
                    "fwd_only": rs_fwd,
                    "num_rays": NUM_RAYS,
                    "num_traced_surfaces": int(num_traced_surfaces),
                    "t_fwdbwd_s": t_fwdbwd,
                    "t_fwd_s": t_fwd,
                    "kernel": "pallas" if use_pallas else "xla",
                    "mesh": MESH_N or 1,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
