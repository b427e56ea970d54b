"""Round-3 TPU validation batch.

Runs every TPU-side check pending for this round, sequentially, with
progress logging — designed to survive a flaky tunnel: it first waits for
the TPU to answer a trivial op (retrying for up to WAIT_MAX seconds), then
runs each stage inside its own try/except so one failure doesn't sink the
batch. Run with OPTILAND_TPU_X64=0 (single process against the TPU).

Stages:
  1. Pallas auto-dispatch parity (core.trace wavelength dispatch)
  2. bench variants: tilted_asphere / polarized / grating / grid_sag
  3. implicit-Newton adjoint timing on the AsphericSinglet
  4. headline bench (full 2^24 rays)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("OPTILAND_TPU_X64", "0")

WAIT_MAX = float(os.environ.get("TPU_WAIT_MAX", 7200))
PROBE_EVERY = 300


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def wait_for_tpu():
    t0 = time.time()
    while time.time() - t0 < WAIT_MAX:
        # probe in a subprocess with its own timeout so a wedged tunnel
        # doesn't hang this script
        try:
            r = subprocess.run(
                ["timeout", "90", sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "print(float(jnp.arange(8.0).sum()))"],
                capture_output=True, text=True,
            )
            if "28.0" in r.stdout:
                log("TPU tunnel responsive")
                return True
        except Exception:
            pass
        log("tunnel not responding; retrying in 5 min")
        time.sleep(PROBE_EVERY)
    return False


def stage(name):
    def deco(fn):
        def run():
            log(f"=== {name} ===")
            t0 = time.time()
            try:
                fn()
                log(f"=== {name} OK ({time.time() - t0:.0f}s) ===")
            except Exception as err:
                log(f"=== {name} FAILED: {type(err).__name__}: {err} ===")
        return run
    return deco


@stage("1 dispatch parity")
def stage_dispatch():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from optiland_tpu.core import raygen, trace as trace_core
    from optiland_tpu.samples import CookeTriplet

    system = CookeTriplet().system
    n = 8192
    rng = np.random.default_rng(0)
    r = np.sqrt(rng.uniform(size=n))
    th = rng.uniform(0, 2 * np.pi, size=n)
    Px = jnp.asarray(r * np.cos(th), jnp.float32)
    Py = jnp.asarray(r * np.sin(th), jnp.float32)
    H = jnp.zeros_like(Px)
    rays = raygen.generate_rays(system, H, H + 0.7, Px, Py, 0.55)
    t0 = time.time()
    fast, hist = trace_core.trace(
        system, rays, record=False, wavelength=0.55
    )
    jax.block_until_ready(fast.x)
    log(f"dispatched trace: {time.time() - t0:.1f}s")
    ref, _ = trace_core.trace(system, rays, record=False)
    jax.block_until_ready(ref.x)
    err = float(jnp.max(jnp.abs(fast.y - ref.y)))
    log(f"dispatch-vs-xla max|dy| = {err:.3e}")
    assert err < 2e-4, err


@stage("2 bench variants")
def stage_variants():
    for name in ("tilted_asphere", "polarized", "grating", "grid_sag"):
        env = {
            **os.environ,
            "BENCH_SYSTEM": name,
            "BENCH_RAYS": os.environ.get("VARIANT_RAYS", "4194304"),
            "BENCH_ITERS": "3",
            "BENCH_INNER": "4",
        }
        t0 = time.time()
        r = subprocess.run(
            ["timeout", "1500", sys.executable, "bench.py"],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        log(f"{name}: {line[-1] if line else 'NO OUTPUT'} "
            f"({time.time() - t0:.0f}s)")
        if r.returncode != 0:
            log(f"{name} stderr tail: {r.stderr[-400:]}")


@stage("3 implicit-Newton adjoint timing")
def stage_newton():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from optiland_tpu.core import raygen
    from optiland_tpu.ops.pallas_trace import trace_fast
    from optiland_tpu.samples import AsphericSinglet

    system = AsphericSinglet().system
    n = 2**22
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    r = jnp.sqrt(jax.random.uniform(k1, (n,), jnp.float32))
    th = jax.random.uniform(k2, (n,), jnp.float32, 0, 2 * np.pi)
    rays = raygen.generate_rays(
        system, jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32),
        r * jnp.cos(th), r * jnp.sin(th), 0.587,
    )

    def merit(stack):
        out = trace_fast(system.replace(stack=stack), rays, 0.587)
        return jnp.mean((out.y - jnp.mean(out.y)) ** 2)

    fwd = jax.jit(merit)
    fwdbwd = jax.jit(lambda s: jax.value_and_grad(merit)(s))
    jax.block_until_ready(fwd(system.stack))
    v, g = fwdbwd(system.stack)
    jax.block_until_ready(g.radius)
    assert np.isfinite(np.asarray(g.coeffs)).all()
    S = system.cfg.num_surfaces - 1
    for label, fn, getter in (
        ("fwd", fwd, lambda o: o),
        ("fwd+bwd", fwdbwd, lambda o: o[1].radius),
    ):
        ts = []
        for i in range(4):
            st = system.stack.replace(
                radius=system.stack.radius + 1e-6 * i
            )
            t0 = time.perf_counter()
            out = fn(st)
            jax.block_until_ready(getter(out))
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        log(f"asphere {label}: {n * S / t:.3e} ray-surf/s ({t * 1e3:.1f} ms)")


@stage("4 headline bench")
def stage_headline():
    r = subprocess.run(
        ["timeout", "1500", sys.executable, "bench.py"],
        capture_output=True, text=True, env={**os.environ},
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    log(f"headline: {line[-1] if line else 'NO OUTPUT'}")
    if line:
        d = json.loads(line[-1])
        log(f"vs_baseline = {d['vs_baseline']:.1f}x")


def main():
    if not wait_for_tpu():
        log("TPU never became responsive; aborting")
        return
    stage_dispatch()
    stage_variants()
    stage_newton()
    stage_headline()
    log("batch complete")


if __name__ == "__main__":
    main()
