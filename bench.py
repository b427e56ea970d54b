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
from optiland_tpu.ops.pallas_trace import (  # noqa: E402
    pallas_field_supported, pallas_supported, trace_fast, trace_fast_field,
)
from optiland_tpu.samples import CookeTriplet  # noqa: E402

# BENCH_SYSTEM selects the benchmarked class (default: the headline Cooke
# triplet on the fused Pallas path). Other classes commit throughput
# evidence for the non-headline paths (docs/PROFILE.md):
#   tilted_asphere - Pallas kernel with in-kernel localize/globalize rotations
#   polarized      - fused polarized kernel (ops/pallas_pol.py) + Jones math
#   grating        - XLA fallback path (diffractive interaction model)
#   grid_sag       - XLA fallback path (gather-based sag, no Pallas)
BENCH_SYSTEM = os.environ.get("BENCH_SYSTEM", "cooke")
NUM_RAYS = int(os.environ.get("BENCH_RAYS", 16_777_216))  # 2**24: multiple of the ray tile, so pad/slice are no-ops
ITERS = int(os.environ.get("BENCH_ITERS", 4))
# Steps fused inside one jitted fori_loop per timed call. The tunneled TPU
# link adds a fixed ~25 ms host-side cost per dispatch; fusing INNER steps
# into one dispatch amortizes it so the measurement reflects device
# throughput (what N steps of a real optimization loop cost), not link RTT.
INNER = int(os.environ.get("BENCH_INNER", 8))
# BENCH_MESH=N: shard rays over an N-device mesh (shard_map around the
# Pallas kernel; psum'd parameter gradients). N must divide the local
# device count; defaults to single-device.
MESH_N = int(os.environ.get("BENCH_MESH", 0))
WAVELENGTH = 0.55


def _build_variant(name):
    """(lens, pol_state) for a BENCH_SYSTEM variant."""
    import numpy as _np

    from optiland_tpu.optic import Optic

    if name in ("cooke", "poly"):
        return CookeTriplet(), None
    if name == "tilted_asphere":
        from optiland_tpu.samples import AsphericSinglet

        o = AsphericSinglet()
        # re-add the stop surface with a 1-degree tilt: exercises the
        # in-kernel localize/globalize rotation path
        o.surfaces.surfaces[1].rx = _np.radians(1.0)
        return o, None
    if name in ("polarized", "polarized_axis", "polarized_tmm"):
        from optiland_tpu.polarization import create_polarization

        if name == "polarized_tmm":
            # 2-layer dielectric AR stacks: in-kernel real-index TMM
            from optiland_tpu.coatings import ThinFilmCoating
            from optiland_tpu.materials import IdealMaterial
            from optiland_tpu.thin_film import ThinFilmStack

            def _stack():
                st = ThinFilmStack(IdealMaterial(1.0), IdealMaterial(1.52),
                                   reference_wl_um=0.55)
                st.add_layer_qwot(IdealMaterial(1.38))
                st.add_layer(IdealMaterial(2.35), 0.08)
                return st

            c1 = ThinFilmCoating(_stack())
            c2 = ThinFilmCoating(_stack())
        elif name == "polarized_axis":
            # polarizer + retarder coats: the full s/p 2x2 in-kernel path
            from optiland_tpu.coatings import (
                PolarizerCoating, RetarderCoating,
            )

            c1 = PolarizerCoating(axis=(1, 0.3, 0))
            c2 = RetarderCoating(_np.pi / 2, axis=(0.2, 1, 0))
        else:
            c1 = c2 = "fresnel"
        o = Optic()
        o.surfaces.add(index=0, radius=_np.inf, thickness=_np.inf)
        o.surfaces.add(index=1, radius=50.0, thickness=5.0,
                       material="N-BK7", is_stop=True, coating=c1)
        o.surfaces.add(index=2, radius=-50.0, thickness=45.0,
                       coating=c2)
        o.surfaces.add(index=3)
        o.set_aperture("EPD", 20.0)
        o.fields.set_type("angle")
        o.fields.add(y=0)
        o.wavelengths.add(0.55, is_primary=True)
        o.set_polarization("H")
        return o, create_polarization("H")
    if name == "grating":
        o = Optic()
        o.surfaces.add(index=0, radius=_np.inf, thickness=_np.inf)
        o.surfaces.add(index=1, radius=30.0, thickness=5.0,
                       material="N-BK7", is_stop=True)
        o.surfaces.add(index=2, radius=-30.0, thickness=5.0)
        o.surfaces.add(index=3, surface_type="grating", thickness=20.0,
                       grating_order=1, grating_period=10.0,
                       groove_orientation_angle=0.3)
        o.surfaces.add(index=4)
    elif name == "nurbs":
        # explicit B-spline net (paraboloid control points): XLA fallback
        # path — one fused two-plane (u,v) Newton solve per surface step
        nn = 7
        xs = _np.linspace(-7, 7, nn)
        X, Y = _np.meshgrid(xs, xs, indexing="ij")
        Z = (X**2 + Y**2) / (2 * 80.0)
        P = _np.stack([X, Y, Z], axis=0)
        o = Optic()
        o.surfaces.add(index=0, radius=_np.inf, thickness=_np.inf)
        o.surfaces.add(index=1, surface_type="nurbs", thickness=6.0,
                       material="N-BK7", is_stop=True,
                       control_points=P.tolist(),
                       weights=_np.ones((nn, nn)).tolist(),
                       u_degree=3, v_degree=3)
        o.surfaces.add(index=2, radius=-60.0, thickness=30.0)
        o.surfaces.add(index=3)
    elif name == "grid_sag":
        xs = _np.linspace(-8.1, 8.1, 34)
        ys = _np.linspace(-8.1, 8.1, 34)
        X, Y = _np.meshgrid(xs, ys)
        sag = 1e-3 * (X**2 + 0.5 * Y**2)
        o = Optic()
        o.surfaces.add(index=0, radius=_np.inf, thickness=_np.inf)
        o.surfaces.add(index=1, surface_type="grid_sag", thickness=6.0,
                       material="N-BK7", is_stop=True,
                       x_coordinates=list(xs), y_coordinates=list(ys),
                       sag_values=sag.tolist())
        o.surfaces.add(index=2, radius=-60.0, thickness=30.0)
        o.surfaces.add(index=3)
    else:
        raise SystemExit(f"unknown BENCH_SYSTEM {name!r}")
    o.set_aperture("EPD", 10.0)
    o.fields.set_type("angle")
    o.fields.add(y=0)
    o.wavelengths.add(0.55, is_primary=True)
    return o, None


def bench_huygens():
    """Huygens-Fresnel summation kernel throughput (the reference's #1
    native hot spot: the Numba-parallel O(P x Q) wavelet loop,
    psf/huygens_fresnel_strategies.py:64-175). Metric: pairwise wavelet
    terms per second, forward and forward+adjoint (both Pallas kernels,
    ops/pallas_huygens.py). vs_baseline compares against the reference's
    summation class measured on this host's CPU with torch tensor math
    (tools/measure_huygens_ref.py) — numba is not installed here, and the
    torch path is the reference's fastest CPU strategy."""
    from optiland_tpu.ops.pallas_huygens import huygens_field_pallas

    # Reference-class rate measured on this host (tools/measure_huygens_ref
    # .py, 2026-08-20): torch CPU chunked pairwise summation.
    baseline = HUYGENS_BASELINE_TERMS_PER_S

    P = int(os.environ.get("BENCH_HUYGENS_IMG", 16_384))   # 128x128 image
    Q = int(os.environ.get("BENCH_HUYGENS_PUP", 65_536))   # pupil points
    wavelength_mm = 0.55e-3
    Rp = 100.0
    a = 10.0
    rng = np.random.default_rng(0)
    r = a * np.sqrt(rng.uniform(size=Q))
    th = rng.uniform(0, 2 * np.pi, size=Q)
    px = jnp.asarray(r * np.cos(th), jnp.float32)
    py = jnp.asarray(r * np.sin(th), jnp.float32)
    pz = -jnp.sqrt(Rp**2 - px**2 - py**2)
    amp = jnp.ones((Q,), jnp.float32)
    opd = jnp.zeros((Q,), jnp.float32)
    g = np.linspace(-0.05, 0.05, int(np.sqrt(P))).astype(np.float32)
    IX, IY = np.meshgrid(g, g)
    ix = jnp.asarray(IX.ravel())
    iy = jnp.asarray(IY.ravel())
    iz = jnp.zeros_like(ix)

    def energy(ix, opd, amp):
        E = huygens_field_pallas(
            ix, iy, iz, px, py, pz, amp, opd, wavelength_mm, Rp
        )
        return jnp.sum(jnp.real(E) ** 2 + jnp.imag(E) ** 2)

    @jax.jit
    def fwd_loop(opd0):
        def body(i, acc):
            return acc + energy(ix, opd0 + 1e-9 * i, amp)

        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0.0))

    @jax.jit
    def fwdbwd_loop(opd0):
        # grads w.r.t. an image array AND two pupil arrays: exercises both
        # adjoint kernels (resident-image and resident-pupil)
        def body(i, carry):
            v_acc, g_acc = carry
            v, grads = jax.value_and_grad(energy, argnums=(0, 1, 2))(
                ix, opd0 + 1e-9 * i, amp
            )
            return v_acc + v, jax.tree.map(jnp.add, g_acc, grads)

        g0 = (jnp.zeros_like(ix), jnp.zeros_like(opd), jnp.zeros_like(amp))
        return jax.lax.fori_loop(0, INNER, body, (jnp.float32(0.0), g0))

    jax.block_until_ready(fwd_loop(opd))
    jax.block_until_ready(fwdbwd_loop(opd))

    def timed(fn):
        ts = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(opd))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / INNER

    t_fwd = timed(fwd_loop)
    t_fwdbwd = timed(fwdbwd_loop)
    terms = float(P) * float(Q)
    print(
        json.dumps(
            {
                "metric": "pairwise_terms_per_sec_fwdbwd_huygens",
                "value": terms / t_fwdbwd,
                "unit": "terms/s",
                "vs_baseline": terms / t_fwdbwd / baseline,
                "extra": {
                    "fwd_only": terms / t_fwd,
                    "image_points": P,
                    "pupil_points": Q,
                    "t_fwdbwd_s": t_fwdbwd,
                    "t_fwd_s": t_fwd,
                    "kernel": "pallas-huygens",
                    "system": "huygens",
                    "baseline_terms_per_s": baseline,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


# Reference-class Huygens summation rate on this host's CPU: 3.34e7
# terms/s (torch chunked pairwise math, the reference's fastest
# non-numba strategy; measured uncontended by
# tools/measure_huygens_ref.py on 2026-08-20, 4 threads).
HUYGENS_BASELINE_TERMS_PER_S = float(
    os.environ.get("BENCH_HUYGENS_BASELINE", 3.34e7)
)


def main():
    if BENCH_SYSTEM == "huygens":
        bench_huygens()
        return
    lens, pol_state = _build_variant(BENCH_SYSTEM)
    system = lens.system
    num_traced_surfaces = system.cfg.num_surfaces - 1
    on_tpu = jax.default_backend() != "cpu"
    use_pallas = pallas_supported(system) and on_tpu
    mesh = None
    if MESH_N:
        from optiland_tpu.parallel.mesh import make_mesh, replicated

        mesh = make_mesh(MESH_N)
        system = jax.device_put(system, replicated(mesh))

    # Fused generate+trace kernel: launch state built in-kernel from 8 SMEM
    # scalars, so the only per-ray HBM input is the pupil sample pair.
    field_ok = use_pallas and pallas_field_supported(system)
    use_field = field_ok and not MESH_N

    def gen_pupil(key):
        k1, k2 = jax.random.split(key)
        r = jnp.sqrt(jax.random.uniform(k1, (NUM_RAYS,), jnp.float32))
        th = jax.random.uniform(k2, (NUM_RAYS,), jnp.float32, 0, 2 * np.pi)
        return r * jnp.cos(th), r * jnp.sin(th)

    def gen(key, sys_):
        Px, Py = gen_pupil(key)
        H = jnp.zeros_like(Px)
        if BENCH_SYSTEM == "poly":
            wl = jnp.take(
                jnp.asarray([0.48, 0.55, 0.65], jnp.float32),
                jnp.arange(NUM_RAYS) % 3,
            )
            return raygen.generate_rays(
                sys_, H, jnp.full_like(Px, 0.7), Px, Py, wl
            )
        return raygen.generate_rays(
            sys_, H, jnp.full_like(Px, 0.7), Px, Py, WAVELENGTH
        )

    use_pol = BENCH_SYSTEM.startswith("polarized") and on_tpu
    # polychromatic class: per-ray wavelengths across the system's three
    # lines through the in-kernel dispersion kernel (trace_fast_poly)
    use_poly = BENCH_SYSTEM == "poly" and on_tpu

    def final_xy(sys_, rays_):
        if use_poly:
            from optiland_tpu.ops.pallas_trace import trace_fast_poly

            out = trace_fast_poly(sys_, rays_)
            return out.x, out.y
        if use_pol:
            # In-kernel exit intensity: the 18 polarization-matrix channels
            # never leave VMEM (trace_fast_pol_intensity docstring).
            if mesh is not None:
                from optiland_tpu.parallel.sharded_trace import (
                    trace_fast_pol_sharded,
                )

                out = trace_fast_pol_sharded(
                    sys_, rays_, WAVELENGTH, state=pol_state, mesh=mesh
                )
            else:
                from optiland_tpu.ops.pallas_pol import (
                    trace_fast_pol_intensity,
                )

                out = trace_fast_pol_intensity(
                    sys_, rays_, WAVELENGTH, state=pol_state
                )
            return out.x * out.i, out.y * out.i
        if use_pallas and mesh is not None:
            from optiland_tpu.parallel.sharded_trace import trace_fast_sharded

            out = trace_fast_sharded(sys_, rays_, WAVELENGTH, mesh=mesh)
        elif use_pallas:
            out = trace_fast(sys_, rays_, WAVELENGTH)
        else:
            out, _ = xla_trace.trace(sys_, rays_, record=False)
        return out.x, out.y

    # End-to-end step: on-device ray generation + trace (+ merit/grad).
    # Inputs vary per step (PRNG key folded with the step index) so no
    # execution/result caching layer can shortcut the measurement.
    def step_xy(key, sys_):
        if use_field and not use_poly:
            Px, Py = gen_pupil(key)
            out = trace_fast_field(sys_, 0.0, 0.7, Px, Py, WAVELENGTH)
            return out.x, out.y
        return final_xy(sys_, gen(key, sys_))

    def merit(key, stack):
        sys_ = system.replace(stack=stack)
        x, y = step_xy(key, sys_)
        return jnp.mean((x - jnp.mean(x)) ** 2 + (y - jnp.mean(y)) ** 2)

    # Fused merit path (cooke headline): pupil PRNG, trace, and the
    # RMS-spot reduction all run inside the Pallas kernels with zero
    # per-ray HBM traffic; the backward builds cotangents in-kernel from
    # the centroid scalars (ops/pallas_trace.spot_rms_fast_field). Under
    # BENCH_MESH the same kernels run per shard with an all_gather of the
    # per-tile Chan stats and psum'd parameter cotangents — O(tiles), not
    # O(rays), of ICI traffic per step.
    use_merit = (
        field_ok and not use_poly
        and os.environ.get("BENCH_FUSED", "1") == "1"
    )

    def merit_fused(seed, stack):
        from optiland_tpu.ops.pallas_trace import spot_rms_fast_field

        sys_ = system.replace(stack=stack)
        if mesh is not None:
            from optiland_tpu.parallel.sharded_trace import (
                spot_rms_fast_field_sharded,
            )

            return spot_rms_fast_field_sharded(
                sys_, 0.0, 0.7, WAVELENGTH, num_rays=NUM_RAYS, seed=seed,
                mesh=mesh,
            )
        return spot_rms_fast_field(
            sys_, 0.0, 0.7, WAVELENGTH, num_rays=NUM_RAYS, seed=seed
        )

    @jax.jit
    def fwdbwd_loop(key, stack):
        def body(i, carry):
            v_acc, g_acc = carry
            if use_merit:
                seed = key[1].astype(jnp.int32) * INNER + i
                v, g = jax.value_and_grad(merit_fused, argnums=1)(
                    seed, stack
                )
            else:
                v, g = jax.value_and_grad(merit, argnums=1)(
                    jax.random.fold_in(key, i), stack
                )
            return v_acc + v, jax.tree.map(jnp.add, g_acc, g)

        g0 = jax.tree.map(jnp.zeros_like, stack)
        return jax.lax.fori_loop(0, INNER, body, (jnp.float32(0.0), g0))

    @jax.jit
    def fwd_loop(key, stack):
        def body(i, acc):
            if use_merit:
                seed = key[1].astype(jnp.int32) * INNER + i
                return acc + merit_fused(seed, stack)
            sys_ = system.replace(stack=stack)
            x, y = step_xy(jax.random.fold_in(key, i), sys_)
            return acc + jnp.mean(x) + jnp.mean(y)

        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0.0))

    keys = [jax.random.PRNGKey(k) for k in range(2 * ITERS + 2)]
    jax.block_until_ready(fwdbwd_loop(keys[-1], system.stack))
    jax.block_until_ready(fwd_loop(keys[-2], system.stack))

    ts = []
    for k in range(ITERS):
        t0 = time.perf_counter()
        out = fwdbwd_loop(keys[k], system.stack)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    t_fwdbwd = float(np.median(ts)) / INNER

    ts = []
    for k in range(ITERS):
        t0 = time.perf_counter()
        o = fwd_loop(keys[ITERS + k], system.stack)
        jax.block_until_ready(o)
        ts.append(time.perf_counter() - t0)
    t_fwd = float(np.median(ts)) / INNER

    rs_fwdbwd = NUM_RAYS * num_traced_surfaces / t_fwdbwd
    rs_fwd = NUM_RAYS * num_traced_surfaces / t_fwd

    metric = "rays_surfaces_per_sec_fwdbwd"
    if BENCH_SYSTEM != "cooke":
        metric += f"_{BENCH_SYSTEM}"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": rs_fwdbwd,
                "unit": "ray-surf/s",
                "vs_baseline": rs_fwdbwd / 2e8,
                "extra": {
                    "fwd_only": rs_fwd,
                    "num_rays": NUM_RAYS,
                    "num_traced_surfaces": int(num_traced_surfaces),
                    "t_fwdbwd_s": t_fwdbwd,
                    "t_fwd_s": t_fwd,
                    "kernel": (
                        "pallas-pol" if use_pol
                        else "pallas-poly" if use_poly
                        else "pallas-merit-sharded" if use_merit and MESH_N
                        else "pallas-merit" if use_merit
                        else "pallas-field" if use_field
                        else "pallas-sharded" if use_pallas and MESH_N
                        else "pallas" if use_pallas else "xla"
                    ),
                    "system": BENCH_SYSTEM,
                    "mesh": MESH_N or 1,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
