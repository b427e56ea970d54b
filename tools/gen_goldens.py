"""Generate golden parity data by running the reference implementation.

Runs the reference Optiland (read-only at /root/reference) on the sample
systems used by the parity suite and dumps traced rays, paraxial
quantities, and material data to ``tests/goldens/*.npz``. The test suite
then compares optiland_tpu outputs against these goldens without importing
the reference at test time.

Usage: python tools/gen_goldens.py
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

# The reference uses numba only for optional JIT acceleration; stub it out.
numba_stub = types.ModuleType("numba")
numba_stub.jit = lambda *a, **k: (a[0] if a and callable(a[0]) else (lambda f: f))
numba_stub.njit = numba_stub.jit
numba_stub.prange = range
sys.modules.setdefault("numba", numba_stub)

sys.path.insert(0, "/root/reference")

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def paraxial_goldens(lens):
    p = lens.paraxial
    out = {}
    for name in ("f1", "f2", "F1", "F2", "P1", "P2", "N1", "N2",
                 "EPL", "EPD", "XPL", "XPD", "FNO", "magnification",
                 "invariant"):
        out[name] = float(np.ravel(getattr(p, name)())[0])
    ym, um = p.marginal_ray()
    yc, uc = p.chief_ray()
    out["marginal_y"] = np.ravel(np.asarray(ym))
    out["marginal_u"] = np.ravel(np.asarray(um))
    out["chief_y"] = np.ravel(np.asarray(yc))
    out["chief_u"] = np.ravel(np.asarray(uc))
    return out


def trace_goldens(lens, cases):
    out = {}
    for tag, (Hx, Hy, wl, nrings) in cases.items():
        rays = lens.trace(Hx=Hx, Hy=Hy, wavelength=wl, num_rays=nrings,
                          distribution="hexapolar")
        for comp in ("x", "y", "z", "L", "M", "N", "i", "opd"):
            out[f"{tag}_{comp}"] = np.asarray(getattr(rays, comp))
        sg = lens.surfaces
        out[f"{tag}_hist_x"] = np.asarray(sg.x)
        out[f"{tag}_hist_y"] = np.asarray(sg.y)
        out[f"{tag}_hist_z"] = np.asarray(sg.z)
        out[f"{tag}_hist_opd"] = np.asarray(sg.opd)
        out[f"{tag}_hist_intensity"] = np.asarray(sg.intensity)
    return out


def main():
    os.makedirs(OUT, exist_ok=True)

    from optiland.samples.objectives import (
        CookeTriplet,
        DoubleGauss,
        TripletTelescopeObjective,
    )

    cases = {
        "onaxis": (0.0, 0.0, 0.55, 6),
        "field1": (0.0, 1.0, 0.55, 6),
        "field07_blue": (0.0, 0.7, 0.48, 5),
        "fieldx": (0.5, 0.5, 0.65, 4),
    }

    for cls, name in (
        (CookeTriplet, "cooke"),
        (DoubleGauss, "double_gauss"),
        (TripletTelescopeObjective, "triplet_telescope"),
    ):
        lens = cls()
        data = {}
        data.update({f"px_{k}": v for k, v in paraxial_goldens(lens).items()})
        wl = lens.primary_wavelength
        local_cases = dict(cases)
        if name == "double_gauss":
            local_cases = {
                k: (hx, hy, {0.55: 0.5876, 0.48: 0.4861, 0.65: 0.6563}[w], n)
                for k, (hx, hy, w, n) in cases.items()
            }
        if name == "triplet_telescope":
            local_cases = {
                k: (hx, hy, {0.55: 0.5876, 0.48: 0.4861, 0.65: 0.6563}[w], n)
                for k, (hx, hy, w, n) in cases.items()
            }
        data.update(trace_goldens(lens, local_cases))
        np.savez_compressed(os.path.join(OUT, f"{name}.npz"), **data)
        print(f"{name}: {len(data)} arrays")

    # Material goldens
    from optiland.materials import AbbeMaterial, Material

    wls = np.linspace(0.4, 0.75, 36)
    mat_data = {"wavelengths": wls}
    for name, ref in (
        ("SK16", None),
        ("F2", "schott"),
        ("N-BK7", None),
        ("SF1", "schott"),
        ("N-SSK2", None),
        ("F5", "schott"),
        ("N-SK16", None),
    ):
        m = Material(name, ref) if ref else Material(name)
        tag = name.replace("-", "_")
        mat_data[f"{tag}_n"] = np.asarray(m.n(wls))
        mat_data[f"{tag}_k"] = np.asarray(m.k(wls))
    ab = AbbeMaterial(1.6, 60.0, model="polynomial")
    mat_data["abbe_poly_n"] = np.ravel(np.asarray(ab.n(np.linspace(0.4, 0.74, 18))))
    ab2 = AbbeMaterial(1.6, 60.0, model="buchdahl")
    mat_data["abbe_buchdahl_n"] = np.ravel(np.asarray(ab2.n(wls)))
    np.savez_compressed(os.path.join(OUT, "materials.npz"), **mat_data)
    print(f"materials: {len(mat_data)} arrays")


def wave_goldens():
    """Wavefront/PSF/MTF/Seidel goldens for the Cooke triplet."""
    import sys
    sys.modules.setdefault("vtk", types.ModuleType("vtk"))
    from optiland.samples.objectives import CookeTriplet
    from optiland.wavefront import Wavefront
    from optiland.psf import FFTPSF, HuygensPSF
    from optiland.mtf import FFTMTF

    lens = CookeTriplet()
    out = {}
    for strat in ("chief_ray", "centroid"):
        wf = Wavefront(lens, num_rays=6, strategy=strat)
        for (fx, fy) in ((0.0, 0.0), (0.0, 1.0)):
            d = wf.get_data((fx, fy), 0.55)
            tag = f"{strat}_{fy:g}"
            out[f"wf_{tag}_opd"] = np.asarray(d.opd)
            out[f"wf_{tag}_px"] = np.asarray(d.pupil_x)
            out[f"wf_{tag}_py"] = np.asarray(d.pupil_y)
            out[f"wf_{tag}_radius"] = np.ravel(np.asarray(d.radius))

    psf = FFTPSF(lens, (0, 0), 0.55, num_rays=32, grid_size=64)
    out["fftpsf_onaxis"] = np.asarray(psf.psf)
    out["fftpsf_strehl"] = psf.strehl_ratio()
    h = HuygensPSF(lens, (0.0, 0.0), 0.55, num_rays=32, image_size=32)
    out["huygens_onaxis"] = np.asarray(h.psf)
    mtf = FFTMTF(lens, num_rays=32, grid_size=64)
    for k in range(3):
        out[f"fftmtf_tan_{k}"] = np.asarray(mtf.mtf[k][0])
        out[f"fftmtf_sag_{k}"] = np.asarray(mtf.mtf[k][1])
        out[f"fftmtf_freq_{k}"] = np.asarray(mtf.freq_tang[k])

    out["seidels"] = np.asarray(lens.aberrations.seidels())
    to = lens.aberrations.third_order()
    names = ["TSC", "SC", "CC", "TCC", "TAC", "AC", "TPC", "PC", "DC",
             "TAchC", "LchC", "TchC"]
    for name, arr in zip(names, to[:12]):
        out[f"thirdorder_{name}"] = np.ravel(np.asarray(arr))

    from optiland.analysis import Distortion, FieldCurvature
    d = Distortion(lens, num_points=16)
    out["distortion"] = np.stack([np.asarray(a) for a in d.data])
    fc = FieldCurvature(lens, num_points=8)
    out["field_curvature_tan"] = np.stack([np.asarray(a[0]) for a in fc.data])
    out["field_curvature_sag"] = np.stack([np.asarray(a[1]) for a in fc.data])
    np.savez_compressed(os.path.join(OUT, "wave_cooke.npz"), **out)
    print(f"wave_cooke: {len(out)} arrays")




def geom_goldens():
    """Geometry-family sag/normal grids and aspheric/tilted trace goldens."""
    from optiland.coordinate_system import CoordinateSystem
    from optiland.geometries import (
        BiconicGeometry,
        ChebyshevPolynomialGeometry,
        EvenAsphere,
        OddAsphere,
        PolynomialGeometry,
        ToroidalGeometry,
        ZernikePolynomialGeometry,
    )

    rng = np.random.default_rng(0)
    x = rng.uniform(-5, 5, 40)
    y = rng.uniform(-5, 5, 40)
    cs = CoordinateSystem()
    cmat = [[0, 1e-4, -1e-6], [2e-4, 1e-5, 0], [1e-6, 0, 1e-8]]
    zc = [0.001, -0.002, 0.0005, 0.0003, 0.0001, 0.0002]
    geoms = {
        "even_asphere": EvenAsphere(cs, 50.0, -0.5, coefficients=[1e-5, -2e-8, 3e-11]),
        "odd_asphere": OddAsphere(cs, 50.0, -0.5, coefficients=[1e-4, -1e-6, 1e-8]),
        "polynomial": PolynomialGeometry(cs, 50.0, -0.5, coefficients=cmat),
        "chebyshev": ChebyshevPolynomialGeometry(
            cs, 50.0, -0.5, coefficients=cmat, norm_x=6.0, norm_y=7.0
        ),
        "zernike": ZernikePolynomialGeometry(
            cs, 50.0, -0.5, coefficients=zc, zernike_type="fringe", norm_radius=8.0
        ),
        "toroidal": ToroidalGeometry(
            cs, radius_x=100.0, radius_y=50.0, conic=-0.5,
            coeffs_poly_y=[1e-5, -1e-8],
        ),
        "biconic": BiconicGeometry(
            cs, radius_x=80.0, radius_y=50.0, conic_x=-0.2, conic_y=-0.8
        ),
    }
    out = {"x": x, "y": y}
    for name, g in geoms.items():
        out[f"{name}_sag"] = np.asarray(g.sag(x, y))
        nx, ny, nz = g._surface_normal(x, y)
        out[f"{name}_nx"] = np.asarray(nx)
        out[f"{name}_ny"] = np.asarray(ny)
        out[f"{name}_nz"] = np.asarray(nz)

    from optiland.samples.simple import AsphericSinglet

    lens = AsphericSinglet()
    rays = lens.trace(Hx=0, Hy=0, wavelength=0.587, num_rays=5)
    for c in ("x", "y", "z", "L", "M", "N", "opd", "i"):
        out[f"asph_{c}"] = np.asarray(getattr(rays, c))

    # tilted/decentered aspheric singlet
    from optiland import optic as ropt
    import optiland.backend as be

    tl = ropt.Optic()
    tl.surfaces.add(index=0, radius=be.inf, thickness=be.inf)
    tl.surfaces.add(
        index=1, thickness=7, radius=20.0, is_stop=True, material="N-SF11",
        surface_type="even_asphere", conic=0.0,
        coefficients=[-2.248851e-4, -4.690412e-6, -6.404376e-8],
        rx=0.02, dy=0.3,
    )
    tl.surfaces.add(index=2, thickness=21.56201105)
    tl.surfaces.add(index=3)
    tl.set_aperture(aperture_type="EPD", value=20.0)
    tl.fields.set_type(field_type="angle")
    tl.fields.add(y=0)
    tl.wavelengths.add(value=0.587, is_primary=True)
    rays = tl.trace(Hx=0, Hy=0, wavelength=0.587, num_rays=5)
    for c in ("x", "y", "z", "L", "M", "N", "opd", "i"):
        out[f"tilted_{c}"] = np.asarray(getattr(rays, c))

    np.savez_compressed(os.path.join(OUT, "geometries.npz"), **out)
    print(f"geometries: {len(out)} arrays")


def _pol_doublet(pol):
    from optiland import optic as ropt
    from optiland.rays import create_polarization
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
    o.set_polarization(create_polarization(pol))
    return o


def pol_goldens():
    """Polarized traces, exit fields, Jones pupil, vectorial PSF/MTF."""
    from optiland.analysis.jones_pupil import JonesPupil
    from optiland.psf.vectorial_fft import VectorialFFTPSF
    from optiland.mtf import HuygensMTF

    out = {}
    for pol in ("unpolarized", "H", "RCP"):
        o = _pol_doublet(pol)
        rays = o.trace(Hx=0, Hy=1.0, wavelength=0.55, num_rays=5)
        out[f"{pol}_y"] = np.asarray(rays.y)
        out[f"{pol}_i"] = np.asarray(rays.i)
        out[f"{pol}_p"] = np.asarray(rays.p)
        fields = rays.get_exit_fields(o.polarization_state)
        for j, E in enumerate(fields):
            out[f"{pol}_E{j}"] = np.asarray(E)

    jp = JonesPupil(_pol_doublet("H"), field=(0, 1.0), grid_size=9)
    out["jones_J"] = np.asarray(jp.data[0]["J"])

    psf = VectorialFFTPSF(_pol_doublet("H"), (0, 0), 0.55,
                          num_rays=32, grid_size=64)
    out["vfft_psf"] = np.asarray(psf.psf)
    out["vfft_strehl"] = np.asarray(psf.strehl_ratio())

    # Scalar Huygens MTF on the Cooke triplet
    from optiland.samples.objectives import CookeTriplet

    hm = HuygensMTF(CookeTriplet(), fields=[(0, 0), (0, 1)],
                    wavelength=0.5876, num_rays=32, image_size=32)
    for k in range(2):
        out[f"hmtf_tan{k}"] = np.asarray(hm.mtf[k][0])
        out[f"hmtf_sag{k}"] = np.asarray(hm.mtf[k][1])
        out[f"hmtf_freq{k}"] = np.asarray(hm.freq_tang[k])
    np.savez_compressed(os.path.join(OUT, "polarization.npz"), **out)
    print(f"polarization: {len(out)} arrays")


def mmdft_goldens():
    """MMDFT PSF on the Cooke triplet, default and custom sampling."""
    from optiland.psf.mmdft import MMDFTPSF
    from optiland.samples.objectives import CookeTriplet

    out = {}
    p1 = MMDFTPSF(CookeTriplet(), (0, 0), 0.5876, num_rays=32)
    out["default_psf"] = np.asarray(p1.psf)
    out["default_pitch"] = np.asarray(p1.pixel_pitch)
    out["default_strehl"] = np.asarray(p1.strehl_ratio())
    p2 = MMDFTPSF(CookeTriplet(), (0, 1.0), 0.5876, num_rays=32,
                  image_size=48, pixel_pitch=1.5)
    out["custom_psf"] = np.asarray(p2.psf)
    np.savez_compressed(os.path.join(OUT, "mmdft.npz"), **out)
    print(f"mmdft: {len(out)} arrays")


def aiming_goldens():
    """Iterative/robust ray aiming traces on infinite and finite conjugates."""
    from optiland.samples.objectives import CookeTriplet

    out = {}
    Px = np.array([0.0, 0.5, 1.0, -0.8])
    Py = np.array([0.0, 0.0, 0.5, -0.3])
    out["Px"], out["Py"] = Px, Py
    for mode in ("iterative", "robust"):
        lens = CookeTriplet()
        lens.set_ray_aiming(mode)
        r = lens.trace_generic(Hx=0.0, Hy=0.7, Px=Px, Py=Py, wavelength=0.55)
        out[f"{mode}_x"] = np.asarray(r.x)
        out[f"{mode}_y"] = np.asarray(r.y)

    # finite-conjugate singlet (directions are the aim variables)
    from optiland import optic as ropt

    def finite():
        o = ropt.Optic()
        o.surfaces.add(index=0, thickness=60.0)
        o.surfaces.add(index=1, radius=30.0, thickness=6.0, material="N-BK7")
        o.surfaces.add(index=2, radius=-30.0, thickness=40.0, is_stop=True)
        o.surfaces.add(index=3)
        o.set_aperture("EPD", 12.0)
        o.fields.set_type("angle")
        o.fields.add(y=0)
        o.fields.add(y=3)
        o.wavelengths.add(0.55, is_primary=True)
        return o

    for mode in ("iterative", "robust"):
        o = finite()
        o.set_ray_aiming(mode)
        r = o.trace_generic(Hx=0.0, Hy=1.0, Px=Px, Py=Py, wavelength=0.55)
        out[f"finite_{mode}_y"] = np.asarray(r.y)
    np.savez_compressed(os.path.join(OUT, "aiming.npz"), **out)
    print(f"aiming: {len(out)} arrays")


def _adv_common(o):
    o.set_aperture("EPD", 10.0)
    o.fields.set_type("angle")
    o.fields.add(y=0)
    o.fields.add(y=3)
    o.wavelengths.add(0.55, is_primary=True)


def adv_geom_goldens():
    """Gratings (plane/curved/reflective), Forbes Qbfs/Q2d, grid sag."""
    from optiland import optic as ropt
    import optiland.backend as be

    out = {}

    def grab(tag, o, hy=1.0):
        rays = o.trace(Hx=0, Hy=hy, wavelength=0.55, num_rays=5)
        for c in ("x", "y", "z", "L", "M", "N", "i", "opd"):
            out[f"{tag}_{c}"] = np.asarray(getattr(rays, c))

    o = ropt.Optic()
    o.surfaces.add(index=0, radius=be.inf, thickness=be.inf)
    o.surfaces.add(index=1, radius=30.0, thickness=5.0, material="N-BK7",
                   is_stop=True)
    o.surfaces.add(index=2, radius=-30.0, thickness=5.0)
    o.surfaces.add(index=3, surface_type="grating", thickness=20.0,
                   grating_order=1, grating_period=10.0,
                   groove_orientation_angle=0.3)
    o.surfaces.add(index=4)
    _adv_common(o)
    grab("plane_grating", o)

    o = ropt.Optic()
    o.surfaces.add(index=0, radius=be.inf, thickness=be.inf)
    o.surfaces.add(index=1, surface_type="grating", radius=100.0, conic=-0.5,
                   thickness=10.0, material="N-BK7", is_stop=True,
                   grating_order=-1, grating_period=25.0,
                   groove_orientation_angle=0.1)
    o.surfaces.add(index=2, radius=be.inf, thickness=30.0)
    o.surfaces.add(index=3)
    _adv_common(o)
    grab("curved_grating", o)
    out["curved_grating_f2"] = np.asarray(o.paraxial.f2())

    o = ropt.Optic()
    o.surfaces.add(index=0, radius=be.inf, thickness=be.inf)
    o.surfaces.add(index=1, surface_type="grating", radius=be.inf,
                   thickness=-30.0, material="mirror", is_stop=True,
                   grating_order=1, grating_period=5.0,
                   groove_orientation_angle=0.0)
    o.surfaces.add(index=2)
    _adv_common(o)
    grab("refl_grating", o)

    o = ropt.Optic()
    o.surfaces.add(index=0, radius=be.inf, thickness=be.inf)
    o.surfaces.add(index=1, surface_type="forbes_qbfs", radius=40.0,
                   conic=-0.8, thickness=6.0, material="N-BK7", is_stop=True,
                   radial_terms={0: 1e-4, 1: -2e-5, 2: 3e-6, 4: 1e-7},
                   norm_radius=12.0)
    o.surfaces.add(index=2, radius=-60.0, thickness=30.0)
    o.surfaces.add(index=3)
    _adv_common(o)
    grab("qbfs", o)

    o = ropt.Optic()
    o.surfaces.add(index=0, radius=be.inf, thickness=be.inf)
    o.surfaces.add(index=1, surface_type="forbes_q2d", radius=40.0, conic=0.0,
                   thickness=6.0, material="N-BK7", is_stop=True,
                   freeform_coeffs={("a", 0, 0): 5e-5, ("a", 0, 1): -1e-5,
                                    ("a", 2, 0): 2e-5, ("b", 2, 0): -1e-5,
                                    ("a", 1, 1): 4e-6, ("b", 3, 1): 2e-6},
                   norm_radius=12.0)
    o.surfaces.add(index=2, radius=-60.0, thickness=30.0)
    o.surfaces.add(index=3)
    _adv_common(o)
    grab("q2d", o)

    xs = np.linspace(-8.1, 8.1, 34)
    ys = np.linspace(-8.1, 8.1, 34)
    X, Y = np.meshgrid(xs, ys)
    sag = 1e-3 * (X**2 + 0.5 * Y**2)
    o = ropt.Optic()
    o.surfaces.add(index=0, radius=be.inf, thickness=be.inf)
    o.surfaces.add(index=1, surface_type="grid_sag", thickness=6.0,
                   material="N-BK7", is_stop=True, x_coordinates=list(xs),
                   y_coordinates=list(ys), sag_values=sag.tolist())
    o.surfaces.add(index=2, radius=-60.0, thickness=30.0)
    o.surfaces.add(index=3)
    _adv_common(o)
    grab("grid", o)

    np.savez_compressed(os.path.join(OUT, "adv_geom.npz"), **out)
    print(f"adv_geom: {len(out)} arrays")


def nurbs_goldens():
    """NURBS surfaces: explicit rational net + conic-fit mode.

    Note: the reference's Bezier/B-Spline convenience modes crash (self.W/U/V
    never assigned, nurbs_geometry.py:118-233) and its fitted mode never fits
    unless update_normalization fires; the golden invokes fit_surface()
    manually."""
    from optiland import optic as ropt
    import optiland.backend as be

    out = {}
    nx_ = ny_ = 7
    xs = np.linspace(-7, 7, nx_)
    ys = np.linspace(-7, 7, ny_)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    Z = (X**2 + Y**2) / (2 * 80.0) + 1e-4 * X * Y
    P = np.stack([X, Y, Z], axis=0)
    W = np.ones((nx_, ny_))
    W[3, 3] = 1.2
    deg = 3
    kn = np.concatenate(
        [np.zeros(deg), np.linspace(0, 1, nx_ - deg + 1), np.ones(deg)]
    )
    out["P"], out["W"], out["kn"] = P, W, kn

    o = ropt.Optic()
    o.surfaces.add(index=0, radius=be.inf, thickness=be.inf)
    o.surfaces.add(index=1, surface_type="nurbs", thickness=6.0,
                   material="N-BK7", is_stop=True, control_points=P,
                   weights=W, u_degree=3, v_degree=3, u_knots=kn, v_knots=kn)
    o.surfaces.add(index=2, radius=-60.0, thickness=30.0)
    o.surfaces.add(index=3)
    _adv_common(o)
    rays = o.trace(Hx=0, Hy=1.0, wavelength=0.55, num_rays=5)
    for c in ("x", "y", "L", "M", "N", "i"):
        out[f"explicit_{c}"] = np.asarray(getattr(rays, c))

    o = ropt.Optic()
    o.surfaces.add(index=0, radius=be.inf, thickness=be.inf)
    o.surfaces.add(index=1, surface_type="nurbs", radius=50.0, conic=-0.5,
                   thickness=6.0, material="N-BK7", is_stop=True,
                   nurbs_norm_x=8.0, nurbs_norm_y=8.0,
                   n_points_u=7, n_points_v=7)
    o.surfaces.add(index=2, radius=-60.0, thickness=30.0)
    o.surfaces.add(index=3)
    _adv_common(o)
    o.surfaces.surfaces[1].geometry.fit_surface()
    rays = o.trace(Hx=0, Hy=1.0, wavelength=0.55, num_rays=5)
    for c in ("x", "y", "L", "M", "N", "i"):
        out[f"fitted_{c}"] = np.asarray(getattr(rays, c))

    np.savez_compressed(os.path.join(OUT, "nurbs.npz"), **out)
    print(f"nurbs: {len(out)} arrays")


_CV_SEQ = """! Test triplet in CODE V sequential format
RDM Y
TITLE 'CV Test Triplet'
EPD 10.0
WL 486.1 587.6 656.3
WTW 1 1 1
REF 2
YAN 0 14 20
SO 0.0 1e11
S 22.01359 3.25896 NSK16_SCHOTT
S -435.76044 6.00755
S -22.21328 0.99997 1.603420:38.0300
STO -25.05 4.75041
S 79.68360 2.95208 NSK16_SCHOTT
  CIR CLR 6.0
S -18.39533 42.20778
  K -0.5
SI 0.0 0.0
"""


def codev_goldens():
    """Reference's trace of a loaded CODE V .seq file."""
    import tempfile

    from optiland.fileio import load_codev_file

    with tempfile.NamedTemporaryFile("w", suffix=".seq", delete=False) as f:
        f.write(_CV_SEQ)
        path = f.name
    lens = load_codev_file(path)
    out = {"f2": np.asarray(float(np.ravel(lens.paraxial.f2())[0]))}
    r = lens.trace(Hx=0, Hy=1.0, wavelength=0.5876, num_rays=5)
    out["y"] = np.asarray(r.y)
    out["i"] = np.asarray(r.i)
    np.savez_compressed(os.path.join(OUT, "codev.npz"), **out)
    print(f"codev: {len(out)} arrays")


def operand_goldens():
    """Aberration / lens / ray constraint operand values on the Cooke
    triplet."""
    from optiland.optimization.operand.aberration import AberrationOperand
    from optiland.optimization.operand.lens import LensOperand
    from optiland.optimization.operand.paraxial import ParaxialOperand
    from optiland.optimization.operand.ray import RayOperand
    from optiland.samples.objectives import CookeTriplet

    ref = CookeTriplet()
    out = {}
    for name in ("TSC", "SC", "CC", "TCC", "TAC", "AC", "TPC", "PC", "DC",
                 "TAchC", "LchC", "TchC"):
        out[name] = np.asarray(float(getattr(AberrationOperand, name)(ref, 3)))
        out[f"{name}_sum"] = np.asarray(
            float(np.sum(np.asarray(getattr(ref.aberrations, name)())))
        )
    out["seidel1"] = np.asarray(float(AberrationOperand.seidels(ref, 1)))
    out["total_track"] = np.asarray(float(ParaxialOperand.total_track(ref)))
    out["edge_thickness_1"] = np.asarray(
        float(LensOperand.edge_thickness(ref, 1))
    )
    out["AOI"] = np.asarray(
        float(RayOperand.AOI(ref, 1, 0.0, 0.5, 0.0, 0.6, 0.55))
    )
    out["clearance"] = np.asarray(float(RayOperand.clearance(
        ref, 2, (0.0, 1.0), (0.0, 0.0), 3, (0.0, 0.0), (0.0, 1.0), 0.55
    )))
    out["y_lcs"] = np.asarray(
        float(RayOperand.y_intercept_lcs(ref, 2, 0.0, 0.7, 0.0, 0.3, 0.55))
    )
    np.savez_compressed(os.path.join(OUT, "operands.npz"), **out)
    print(f"operands: {len(out)} arrays")


def colorimetry_goldens():
    """CIE XYZ / sRGB values from the reference colorimetry engine."""
    from optiland.colorimetry.core import (
        spectrum_to_xyz,
        xyz_to_srgb,
        xyz_to_xyY,
    )

    wl = np.linspace(360, 830, 200)
    spec = 0.5 + 0.4 * np.sin((wl - 380) / 80.0)
    xyz = spectrum_to_xyz(list(wl), list(spec))
    out = {
        "wl": wl,
        "spec": spec,
        "xyz": np.asarray(xyz, float),
        "xyz10": np.asarray(
            spectrum_to_xyz(list(wl), list(spec), observer="10deg"), float
        ),
        "srgb": np.asarray([int(v) for v in xyz_to_srgb(*xyz)]),
        "xyY": np.asarray(xyz_to_xyY(*xyz), float),
    }
    np.savez_compressed(os.path.join(OUT, "colorimetry.npz"), **out)
    print(f"colorimetry: {len(out)} arrays")


if __name__ == "__main__":
    main()
    wave_goldens()
    geom_goldens()
    pol_goldens()
    mmdft_goldens()
    aiming_goldens()
    adv_geom_goldens()
    nurbs_goldens()
    codev_goldens()
    operand_goldens()
    colorimetry_goldens()
    field_type_goldens()


def field_type_goldens():
    """Image-height field definitions on the Cooke triplet."""
    from optiland import optic as ropt
    import optiland.backend as be

    out = {}
    for ftype in ("paraxial_image_height", "real_image_height"):
        o = ropt.Optic()
        o.surfaces.add(index=0, radius=be.inf, thickness=be.inf)
        o.surfaces.add(index=1, radius=22.01359, thickness=3.25896,
                       material="SK16", is_stop=True)
        o.surfaces.add(index=2, radius=-435.76044, thickness=6.00755)
        o.surfaces.add(index=3, radius=-22.21328, thickness=0.99997,
                       material=("F2", "schott"))
        o.surfaces.add(index=4, radius=20.29192, thickness=4.75041)
        o.surfaces.add(index=5, radius=79.68360, thickness=2.95208,
                       material="SK16")
        o.surfaces.add(index=6, radius=-18.39533, thickness=42.20778)
        o.surfaces.add(index=7)
        o.set_aperture("EPD", 10.0)
        o.fields.set_type(ftype)
        o.fields.add(y=0)
        o.fields.add(y=18.0)
        o.wavelengths.add(0.55, is_primary=True)
        rays = o.trace(Hx=0, Hy=1.0, wavelength=0.55, num_rays=5)
        out[f"{ftype}_y"] = np.asarray(rays.y)
        out[f"{ftype}_x"] = np.asarray(rays.x)
        yc, uc = o.paraxial.chief_ray()
        out[f"{ftype}_chief_y"] = np.ravel(np.asarray(yc))
    np.savez_compressed(os.path.join(OUT, "field_types.npz"), **out)
    print(f"field_types: {len(out)} arrays")
