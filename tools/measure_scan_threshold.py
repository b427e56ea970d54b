"""Compile-time vs surface-count: unrolled vs scan trace engine (CPU f64)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["OPTILAND_TPU_X64"] = "1"
# fresh, isolated compile cache so measurements are cold
os.environ["OPTILAND_TPU_TEST_CACHE"] = "0"
os.environ.pop("OPTILAND_TPU_COMPILE_CACHE", None)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from optiland_tpu.optic import Optic
from optiland_tpu.core import trace as trace_core, raygen

def build(S):
    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    for i in range(1, S+1):
        mat = "N-BK7" if i % 2 == 1 else None
        kw = dict(index=i, radius=50.0 + 3*i if i % 2 else -(40.0 + 2*i),
                  thickness=3.0)
        if mat: kw["material"] = mat
        if i == 1: kw["is_stop"] = True
        o.surfaces.add(**kw)
    o.surfaces.add(index=S+1)
    o.set_aperture("EPD", 10.0)
    o.fields.set_type("angle"); o.fields.add(y=0)
    o.wavelengths.add(0.55, is_primary=True)
    return o.system

for S in (4, 6, 8, 10, 12, 16):
    sys_ = build(S)
    rays = raygen.generate_rays(sys_, 0.0, 0.0, jnp.linspace(-1,1,64), jnp.zeros(64), 0.55)
    for mode in ("unrolled", "scan"):
        os.environ["OPTILAND_TPU_TRACE_ENGINE"] = mode
        t0 = time.perf_counter()
        f = jax.jit(lambda s, r: trace_core.trace(s, r, record=True)[0].x)
        out = f(sys_, rays); jax.block_until_ready(out)
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(20):
            jax.block_until_ready(f(sys_, rays))
        t_run = (time.perf_counter() - t0) / 20
        print(f"S={S:3d} {mode:9s} compile={t_compile:7.3f}s run={t_run*1e3:8.3f}ms")
