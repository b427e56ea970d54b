"""Third-order (Seidel) aberration theory.

Per-surface third-order transverse aberration contributions and first-order
chromatic terms, per W. Smith, Modern Optical Engineering ch. 6.3 — a direct
functional port of the reference's formulas including its indexing
conventions (reference: optiland/aberrations.py:24-462). All terms are pure
functions of the paraxial marginal/chief rays, so they are differentiable
through jax.grad.
"""

from __future__ import annotations

import jax.numpy as jnp

from optiland_tpu.core import paraxial
from optiland_tpu.core.system import System, n_all


class Aberrations:
    """Aberration computations for an Optic (reference: aberrations.py:24)."""

    def __init__(self, optic):
        self.optic = optic

    def _pre(self):
        system = self.optic.system
        return _precalculations(system)

    def third_order(self):
        """All third-order terms and first-order color
        (reference: aberrations.py:37-91)."""
        p = self._pre()
        TSC = p["TSC"]
        CC = p["CC"]
        TAC = p["TAC"]
        TPC = p["TPC"]
        DC = p["DC"]
        TAchC = p["TAchC"]
        TchC = p["TchC"]
        ua_final = p["ua"][-1]
        SC = -TSC / ua_final
        AC = -TAC / ua_final
        PC = -TPC / ua_final
        LchC = -TAchC / ua_final
        S = p["S"]
        TCC = CC * 3
        return (TSC, SC, CC, TCC, TAC, AC, TPC, PC, DC, TAchC, LchC, TchC, S)

    def seidels(self):
        return self._pre()["S"]

    def TSC(self):
        return self._pre()["TSC"]

    def SC(self):
        p = self._pre()
        return -p["TSC"] / p["ua"][-1]

    def CC(self):
        return self._pre()["CC"]

    def TCC(self):
        return self.CC() * 3

    def TAC(self):
        return self._pre()["TAC"]

    def AC(self):
        p = self._pre()
        return -p["TAC"] / p["ua"][-1]

    def TPC(self):
        return self._pre()["TPC"]

    def PC(self):
        p = self._pre()
        return -p["TPC"] / p["ua"][-1]

    def DC(self):
        return self._pre()["DC"]

    def TAchC(self):
        return self._pre()["TAchC"]

    def LchC(self):
        p = self._pre()
        return -p["TAchC"] / p["ua"][-1]

    def TchC(self):
        return self._pre()["TchC"]


def _precalculations(system: System):
    """Common paraxial quantities and all per-surface terms
    (reference: aberrations.py:250-304)."""
    inv = paraxial.invariant(system)
    on_axis = jnp.isclose(inv, 0.0)
    n = n_all(system.stack, system.cfg, system.primary_wavelength)
    N = system.cfg.num_surfaces
    C = 1.0 / system.stack.radius
    ya, ua = paraxial.marginal_ray(system)
    yb, ub = paraxial.chief_ray(system)
    ya, ua, yb, ub = (jnp.ravel(a) for a in (ya, ua, yb, ub))
    hp = inv / (n[-1] * ua[-1])
    dn = n_all(system.stack, system.cfg, 0.4861) - n_all(
        system.stack, system.cfg, 0.6563
    )

    ks = list(range(1, N - 1))
    i_v, ip_v, B_v, Bp_v = [], [], [], []
    for k in ks:
        i_val = C[k] * ya[k] + ua[k - 1]
        ip_val = C[k] * yb[k] + ub[k - 1]
        i_v.append(i_val)
        ip_v.append(ip_val)
        denom = 2 * n[k] * jnp.where(on_axis, 1.0, inv)
        B = n[k - 1] * (n[k] - n[k - 1]) * ya[k] * (ua[k] + i_val) / denom
        Bp = n[k - 1] * (n[k] - n[k - 1]) * yb[k] * (ub[k] + ip_val) / denom
        B_v.append(jnp.where(on_axis, 0.0, B))
        Bp_v.append(jnp.where(on_axis, 0.0, Bp))
    i_arr = jnp.stack(i_v)
    ip_arr = jnp.stack(ip_v)
    B = jnp.stack(B_v)
    Bp = jnp.stack(Bp_v)

    # TSC: on-axis closed form vs B i^2 hp (reference: aberrations.py:306-340)
    tsc_on = []
    for idx, k in enumerate(ks):
        term = (
            n[k - 1] * (n[k] - n[k - 1]) * ya[k] * (ua[k] + i_arr[idx])
            * i_arr[idx] ** 2
        )
        tsc_on.append(term / (2 * n[k] * n[-1] * ua[-1]))
    tsc_on = jnp.stack(tsc_on)
    TSC = jnp.where(on_axis, tsc_on, B * i_arr**2 * hp)

    CC = B * i_arr * ip_arr * hp
    TAC = B * ip_arr**2 * hp

    TPC = jnp.stack(
        [
            (n[k] - n[k - 1]) * C[k] * hp * inv / (2 * n[k] * n[k - 1])
            for k in ks
        ]
    )
    DC = jnp.stack(
        [
            hp
            * (
                Bp[idx] * i_arr[idx] * ip_arr[idx]
                + 0.5 * (ub[k] ** 2 - ub[k - 1] ** 2)
            )
            for idx, k in enumerate(ks)
        ]
    )
    TAchC = jnp.stack(
        [
            -ya[k - 1] * i_arr[idx] / (n[-1] * ua[-1])
            * (dn[k - 1] - n[k - 1] / n[k] * dn[k])
            for idx, k in enumerate(ks)
        ]
    )
    TchC = jnp.stack(
        [
            -ya[k - 1] * ip_arr[idx] / (n[-1] * ua[-1])
            * (dn[k - 1] - n[k - 1] / n[k] * dn[k])
            for idx, k in enumerate(ks)
        ]
    )

    factor = n[-1] * ua[-1] * 2
    S = jnp.stack(
        [
            -jnp.sum(TSC) * factor,
            -jnp.sum(CC) * factor,
            -jnp.sum(TAC) * factor,
            -jnp.sum(TPC) * factor,
            -jnp.sum(DC) * factor,
        ]
    )

    return {
        "TSC": TSC, "CC": CC, "TAC": TAC, "TPC": TPC, "DC": DC,
        "TAchC": TAchC, "TchC": TchC, "S": S, "ua": ua,
    }
