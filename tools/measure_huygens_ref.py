"""Measure the reference-class Huygens summation rate on this host's CPU.

The reference's Huygens-Fresnel PSF sums O(P x Q) spherical wavelets
(reference: optiland/psf/huygens_fresnel_strategies.py:64-175 — a Numba
parallel kernel, with a torch tensor strategy at :175). Numba is not
installed in this environment, so the comparable here is the torch
strategy's math: chunked pairwise distance/phase blocks in complex64,
which is also the reference's GPU-capable path run on CPU.

Prints a JSON line with pairwise terms/s; the value feeds
HUYGENS_BASELINE_TERMS_PER_S in bench.py (the vs_baseline denominator of
the BENCH_SYSTEM=huygens class).
"""

from __future__ import annotations

import json
import time

import numpy as np
import torch

P = 4_096
Q = 16_384
CHUNK = 256
WAVELENGTH_MM = 0.55e-3
RP = 100.0


def main():
    torch.set_num_threads(torch.get_num_threads())  # default: all cores
    rng = np.random.default_rng(0)
    r = 10.0 * np.sqrt(rng.uniform(size=Q))
    th = rng.uniform(0, 2 * np.pi, size=Q)
    px = torch.tensor(r * np.cos(th), dtype=torch.float32)
    py = torch.tensor(r * np.sin(th), dtype=torch.float32)
    pz = -torch.sqrt(RP**2 - px**2 - py**2)
    amp = torch.ones(Q)
    opd = torch.zeros(Q)
    g = np.linspace(-0.05, 0.05, int(np.sqrt(P))).astype(np.float32)
    IX, IY = np.meshgrid(g, g)
    ix = torch.tensor(IX.ravel())
    iy = torch.tensor(IY.ravel())
    iz = torch.zeros(P)

    k = 2.0 * np.pi / WAVELENGTH_MM
    nx, ny, nz = px / RP, py / RP, pz / RP
    pupil_amp = (amp * torch.exp(-1j * k * opd)).to(torch.complex64)

    def field():
        out = torch.empty(P, dtype=torch.complex64)
        for i0 in range(0, P, CHUNK):
            sl = slice(i0, i0 + CHUNK)
            dx = ix[sl, None] - px[None, :]
            dy = iy[sl, None] - py[None, :]
            dz = iz[sl, None] - pz[None, :]
            R = torch.sqrt(dx * dx + dy * dy + dz * dz)
            obliq = 0.5 * (
                1.0 + (dx * nx + dy * ny + dz * nz) / R
            )
            E = pupil_amp[None, :] * torch.exp(1j * k * R) / R * obliq
            out[sl] = E.sum(dim=1)
        return out

    field()  # warm-up
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        field()
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    print(
        json.dumps(
            {
                "metric": "pairwise_terms_per_sec_ref_torch_cpu",
                "value": P * Q / t,
                "unit": "terms/s",
                "extra": {
                    "image_points": P,
                    "pupil_points": Q,
                    "t_s": t,
                    "threads": torch.get_num_threads(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
