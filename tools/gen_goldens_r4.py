"""Round-4 golden generation: the analysis regression battery on a SECOND
and THIRD sample (DoubleGauss, TessarLens) so analysis parity isn't pinned
to the Cooke triplet alone (companion to gen_goldens*.py; run the
REFERENCE implementation and dump arrays).

Usage: python tools/gen_goldens_r4.py
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

numba_stub = types.ModuleType("numba")
numba_stub.jit = lambda *a, **k: (a[0] if a and callable(a[0]) else (lambda f: f))
numba_stub.njit = numba_stub.jit
numba_stub.prange = range
sys.modules.setdefault("numba", numba_stub)
sys.modules.setdefault("vtk", types.ModuleType("vtk"))

sys.path.insert(0, "/root/reference")

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def wavefront_multi():
    """All three reference strategies on DoubleGauss at two fields."""
    from optiland.samples.objectives import DoubleGauss
    from optiland.wavefront import Wavefront

    lens = DoubleGauss()
    out = {}
    fields = lens.fields.get_field_coords()  # (0,0) and (0, 5/7) used
    wl = 0.5876  # DoubleGauss primary (d line)
    for strat in ("chief_ray", "centroid", "best_fit"):
        wf = Wavefront(lens, num_rays=6, strategy=strat)
        for k, (fx, fy) in enumerate(fields[:2]):
            d = wf.get_data((fx, fy), wl)
            tag = f"{strat}_{k}"
            out[f"wf_{tag}_opd"] = np.asarray(d.opd)
            out[f"wf_{tag}_px"] = np.asarray(d.pupil_x)
            out[f"wf_{tag}_py"] = np.asarray(d.pupil_y)
            out[f"wf_{tag}_radius"] = np.ravel(np.asarray(d.radius))
    np.savez_compressed(os.path.join(OUT, "wave_dg.npz"), **out)
    print(f"wave_dg.npz: {len(out)} arrays")


def analysis_multi():
    from optiland.analysis import (
        Distortion,
        FieldCurvature,
        RmsSpotSizeVsField,
        SpotDiagram,
    )
    from optiland.mtf import FFTMTF
    from optiland.psf import FFTPSF
    from optiland.samples.objectives import DoubleGauss, TessarLens

    out = {}
    for tag, cls in (("dg", DoubleGauss), ("tessar", TessarLens)):
        lens = cls()

        spot = SpotDiagram(lens)
        out[f"{tag}_spot_rms"] = np.asarray(
            [[float(v) for v in row] for row in spot.rms_spot_radius()]
        )
        out[f"{tag}_spot_geo"] = np.asarray(
            [[float(v) for v in row] for row in spot.geometric_spot_radius()]
        )

        d = Distortion(lens, num_points=24)
        out[f"{tag}_distortion"] = np.stack(
            [np.ravel(np.asarray(v)) for v in d.data]
        )

        fc = FieldCurvature(lens, num_points=24)
        out[f"{tag}_field_curv"] = np.stack(
            [np.stack([np.ravel(np.asarray(t)) for t in pair])
             for pair in fc.data]
        )

        rv = RmsSpotSizeVsField(lens, num_fields=16)
        out[f"{tag}_rms_field"] = np.asarray(rv._spot_size)

        psf = FFTPSF(lens, field=(0, 0), wavelength=0.55, num_rays=64)
        out[f"{tag}_strehl"] = float(psf.strehl_ratio())

        mtf = FFTMTF(lens, fields=[(0, 0)], wavelength=0.55,
                     num_rays=32, grid_size=64)
        # (tangential, sagittal) of field 0
        out[f"{tag}_mtf_tan"] = np.asarray(mtf.mtf[0][0])
        out[f"{tag}_mtf_sag"] = np.asarray(mtf.mtf[0][1])
        out[f"{tag}_seidels"] = np.ravel(
            np.asarray(lens.aberrations.seidels())
        )
        print(f"  {tag}: ok")

    np.savez_compressed(os.path.join(OUT, "analysis_multi.npz"), **out)
    print(f"analysis_multi.npz: {len(out)} arrays")


def vectorial_huygens():
    """Vectorial Huygens PSF on the Fresnel-coated polarized doublet."""
    from optiland import optic as ropt
    from optiland.rays import create_polarization
    from optiland.psf.vectorial_huygens import VectorialHuygensPSF
    import optiland.backend as be

    o = ropt.Optic()
    o.surfaces.add(index=0, radius=be.inf, thickness=be.inf)
    o.surfaces.add(index=1, radius=50.0, thickness=5.0, material="N-BK7",
                   is_stop=True, coating="fresnel")
    o.surfaces.add(index=2, radius=-50.0, thickness=45.0, coating="fresnel")
    o.surfaces.add(index=3)
    o.set_aperture("EPD", 20.0)
    o.fields.set_type("angle")
    o.fields.add(y=0)
    o.fields.add(y=5)
    o.wavelengths.add(0.55, is_primary=True)
    o.set_polarization(create_polarization("H"))

    psf = VectorialHuygensPSF(o, (0.0, 0.0), 0.55, num_rays=16,
                              image_size=16)
    out = {
        "vh_psf": np.asarray(psf.psf),
        "vh_strehl": np.asarray(psf.strehl_ratio()),
    }
    np.savez_compressed(os.path.join(OUT, "vhuygens.npz"), **out)
    print(f"vhuygens.npz: {len(out)} arrays")


def polarization_mirror():
    """Polarized traces through a reflective system (Hubble): reflection
    p-matrices are a separate physics branch from refraction."""
    from optiland.rays import create_polarization
    from optiland.samples.telescopes import HubbleTelescope

    out = {}
    for pol in ("unpolarized", "H", "RCP"):
        lens = HubbleTelescope()
        if pol != "unpolarized":
            lens.set_polarization(create_polarization(pol))
        else:
            lens.set_polarization(create_polarization("unpolarized"))
        rays = lens.trace(Hx=0, Hy=0.7, wavelength=0.55, num_rays=5)
        out[f"hubble_{pol}_y"] = np.asarray(rays.y)
        out[f"hubble_{pol}_i"] = np.asarray(rays.i)
        out[f"hubble_{pol}_p"] = np.asarray(rays.p)
    np.savez_compressed(os.path.join(OUT, "pol_mirror.npz"), **out)
    print(f"pol_mirror.npz: {len(out)} arrays")


def bestfit_rayfan():
    """BestFitRayFan golden on the Cooke triplet
    (reference: analysis/ray_fan.py:247-320)."""
    from optiland.analysis.ray_fan import BestFitRayFan
    from optiland.samples.objectives import CookeTriplet

    lens = CookeTriplet()
    fan = BestFitRayFan(lens, fields="all", wavelengths="all",
                        num_points=9, num_rays_for_fit=6)
    d = fan.data if hasattr(fan, "data") else fan._generate_data()
    save = {"Px": np.asarray(d["Px"]), "Py": np.asarray(d["Py"])}
    fi = 0
    for k in d:
        if k in ("Px", "Py"):
            continue
        wi = 0
        for wl, rec in d[k].items():
            save[f"f{fi}_w{wi}_x"] = np.asarray(rec["x"])
            save[f"f{fi}_w{wi}_y"] = np.asarray(rec["y"])
            save[f"f{fi}_w{wi}_wl"] = float(wl)
            wi += 1
        save[f"f{fi}_coord"] = np.asarray(eval(k))
        fi += 1
    save["num_fields"] = fi
    save["num_wl"] = wi
    np.savez(os.path.join(OUT, "bestfit_rayfan.npz"), **save)
    print(f"bestfit_rayfan.npz: {len(save)} arrays")


if __name__ == "__main__":
    import sys as _sys

    sections = _sys.argv[1:] or ["analysis", "wavefront", "polmirror", "vhuygens", "bestfitfan"]
    if "analysis" in sections:
        analysis_multi()
    if "wavefront" in sections:
        wavefront_multi()
    if "polmirror" in sections:
        polarization_mirror()
    if "vhuygens" in sections:
        vectorial_huygens()
    if "bestfitfan" in sections:
        bestfit_rayfan()
