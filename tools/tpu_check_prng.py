"""TPU hardware check: PRNG-mode fused merit vs explicit-pupil path.

Validates the sub-block PRNG contract (ops/pallas_trace._prng_disk):
  1. The samples drawn in-kernel equal the extraction kernel's output fed
     back through the explicit-Px/Py path (loss match).
  2. The PRNG-mode gradient equals the explicit-pupil gradient on the same
     sample set (the advisor's round-4 finding: with per-grid-step seeding
     the 512-row forward and 64-row backward regenerated DIFFERENT sample
     sets, so the gradient was not the gradient of the returned loss).
  3. The gradient is invariant to the backward tile height (64 vs 32).
  4. The 1-device sharded fused merit reproduces the unsharded kernel.

Run: python tools/tpu_check_prng.py   (needs the real TPU; OPTILAND_TPU_X64=0)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OPTILAND_TPU_X64", "0")

import jax
import jax.numpy as jnp
import numpy as np

from optiland_tpu.ops.pallas_trace import (
    prng_pupil_samples, spot_rms_fast_field,
)
from optiland_tpu.samples import CookeTriplet


def main():
    assert jax.default_backend() != "cpu", "this check needs the real TPU"
    system = CookeTriplet().system
    R = 262_144  # 2**18: multiple of the PRNG sub-block (32*128)
    seed = 42

    Px, Py = prng_pupil_samples(seed, R)
    Px, Py = np.asarray(Px), np.asarray(Py)
    assert (Px**2 + Py**2 <= 1.0 + 1e-6).all(), "samples outside unit disk"

    def loss_prng(stack, bwd_tile=None):
        s = system.replace(stack=stack)
        return spot_rms_fast_field(
            s, 0.0, 0.7, 0.55, num_rays=R, seed=seed, bwd_tile=bwd_tile
        )

    def loss_expl(stack):
        s = system.replace(stack=stack)
        return spot_rms_fast_field(
            s, 0.0, 0.7, 0.55, Px=jnp.asarray(Px), Py=jnp.asarray(Py)
        )

    v1, g1 = jax.value_and_grad(loss_prng)(system.stack)
    v2, g2 = jax.value_and_grad(loss_expl)(system.stack)
    v1, v2 = float(v1), float(v2)
    print(f"loss  prng={v1:.9e}  explicit={v2:.9e}")
    np.testing.assert_allclose(v1, v2, rtol=1e-6)
    for leaf in ("radius", "thickness", "conic"):
        a, b = np.asarray(getattr(g1, leaf)), np.asarray(getattr(g2, leaf))
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-10)
    print("PRNG-mode grad == explicit-pupil grad  OK")

    _, g3 = jax.value_and_grad(lambda st: loss_prng(st, bwd_tile=32))(
        system.stack
    )
    np.testing.assert_allclose(
        np.asarray(g3.radius), np.asarray(g1.radius), rtol=1e-6
    )
    print("grad invariant to bwd tile height (64 vs 32)  OK")

    from optiland_tpu.parallel.mesh import make_mesh
    from optiland_tpu.parallel.sharded_trace import (
        spot_rms_fast_field_sharded,
    )

    mesh = make_mesh(1)

    def loss_sh(stack):
        return spot_rms_fast_field_sharded(
            system.replace(stack=stack), 0.0, 0.7, 0.55,
            num_rays=R, seed=seed, mesh=mesh,
        )

    v4, g4 = jax.value_and_grad(loss_sh)(system.stack)
    np.testing.assert_allclose(float(v4), v1, rtol=1e-7)
    np.testing.assert_allclose(
        np.asarray(g4.radius), np.asarray(g1.radius), rtol=1e-5
    )
    print("sharded(1) fused merit == unsharded  OK")
    print("ALL PRNG CHECKS PASSED")


if __name__ == "__main__":
    main()
