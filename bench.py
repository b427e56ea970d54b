"""Benchmark: forward+backward ray-trace throughput on the Cooke triplet.

Prints one JSON line:
  {"metric": "rays_surfaces_per_sec_fwdbwd", "value": N, "unit": "ray-surf/s",
   "vs_baseline": N / 2e8}

The baseline 2e8 is the reference's best published number (150-200 M
ray-surfaces/s on GPU, reference docs/functionalities.rst:112). The driver
target (BASELINE.json) is >1e9/chip fwd+bwd.

Runs in float32 on the available accelerator (float64 is software-emulated
on TPU; parity suites use x64 on CPU instead).
"""

from __future__ import annotations

import json
import os
import time

os.environ["OPTILAND_TPU_X64"] = "0"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from optiland_tpu.analysis.spot import spot_coordinates  # noqa: E402
from optiland_tpu.samples import CookeTriplet  # noqa: E402

NUM_RAYS = int(os.environ.get("BENCH_RAYS", 4_000_000))
ITERS = int(os.environ.get("BENCH_ITERS", 20))


def main():
    lens = CookeTriplet()
    system = lens.system
    cfg = system.cfg
    num_traced_surfaces = cfg.num_surfaces - 1  # object surface is a no-op

    rng = np.random.default_rng(0)
    r = np.sqrt(rng.uniform(size=NUM_RAYS))
    th = rng.uniform(0, 2 * np.pi, size=NUM_RAYS)
    Px = jnp.asarray(r * np.cos(th), jnp.float32)
    Py = jnp.asarray(r * np.sin(th), jnp.float32)
    Hx = jnp.zeros_like(Px)
    Hy = jnp.full_like(Px, 0.7)

    def merit(stack):
        sys2 = system.replace(stack=stack)
        x, y, _ = spot_coordinates(sys2, Hx, Hy, Px, Py, 0.55)
        return jnp.mean((x - jnp.mean(x)) ** 2 + (y - jnp.mean(y)) ** 2)

    fwdbwd = jax.jit(jax.value_and_grad(merit))
    fwd = jax.jit(merit)

    # Warmup / compile
    v, g = fwdbwd(system.stack)
    jax.block_until_ready((v, g))
    jax.block_until_ready(fwd(system.stack))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        v, g = fwdbwd(system.stack)
    jax.block_until_ready((v, g))
    t_fwdbwd = (time.perf_counter() - t0) / ITERS

    t0 = time.perf_counter()
    for _ in range(ITERS):
        v = fwd(system.stack)
    jax.block_until_ready(v)
    t_fwd = (time.perf_counter() - t0) / ITERS

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
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
