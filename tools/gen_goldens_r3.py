"""Round-3 golden generation: run the reference implementation across ALL
sample systems and the remaining subsystems, dumping arrays the deep parity
tests compare against (companion to gen_goldens.py / gen_goldens_r2.py).

Usage: python tools/gen_goldens_r3.py [section ...]
Sections: samples geom materials env jones analysis solves thinfilm
(default: all)
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

SAMPLE_NAMES = [
    "AsphericSinglet", "CementedAchromat", "CookeTriplet", "DoubleGauss",
    "Edmund_49_847", "EyepieceErfle", "HeliarLens", "HubbleTelescope",
    "InfraredTriplet", "InfraredTripletF4", "LensWithFieldCorrector",
    "Microscope20x", "NavarroWideAngleEye", "Objective60x",
    "ObjectiveUS008879901", "PetzvalLens", "ProjectionLens120FOV",
    "ProjectionLens160FOV", "ReverseTelephoto", "SingletStopSurf2",
    "Telephoto", "TelescopeDoublet", "TelescopeObjective48Inch",
    "TessarLens", "TripletTelescopeObjective", "UVProjectionLens",
    "UVReflectingMicroscope", "WideAngle100FOV", "WideAngle170FOV",
]

PX_SCALARS = ("f1", "f2", "F1", "F2", "P1", "P2", "N1", "N2",
              "EPL", "EPD", "XPL", "XPD", "FNO", "magnification",
              "invariant")


def samples_deep():
    """Paraxial scalars, marginal/chief rays, Seidel sums, and real traces
    for every sample system."""
    import optiland.samples as rs
    ns = {}
    for mod in ("objectives", "telescopes", "eyepieces", "microscopes",
                "infrared", "lithography", "miscellaneous", "simple"):
        m = __import__(f"optiland.samples.{mod}", fromlist=["*"])
        for k in dir(m):
            if not k.startswith("_"):
                ns.setdefault(k, getattr(m, k))

    out = {}
    for name in SAMPLE_NAMES:
        cls = ns.get(name)
        if cls is None:
            print(f"  {name}: NOT FOUND in reference")
            continue
        try:
            lens = cls()
        except Exception as e:
            print(f"  {name}: ctor failed ({e})")
            continue
        p = lens.paraxial
        for q in PX_SCALARS:
            try:
                out[f"{name}_{q}"] = float(np.ravel(getattr(p, q)())[0])
            except Exception:
                pass
        try:
            ym, um = p.marginal_ray()
            yc, uc = p.chief_ray()
            out[f"{name}_marginal_y"] = np.ravel(np.asarray(ym))
            out[f"{name}_marginal_u"] = np.ravel(np.asarray(um))
            out[f"{name}_chief_y"] = np.ravel(np.asarray(yc))
            out[f"{name}_chief_u"] = np.ravel(np.asarray(uc))
        except Exception as e:
            print(f"  {name}: paraxial rays failed ({e})")
        try:
            out[f"{name}_seidels"] = np.asarray(lens.aberrations.seidels())
        except Exception as e:
            print(f"  {name}: seidels failed ({e})")
        wl = float(lens.primary_wavelength)
        out[f"{name}_wl"] = wl
        for tag, (hx, hy) in {"axis": (0.0, 0.0), "field": (0.0, 0.7)}.items():
            try:
                rays = lens.trace(Hx=hx, Hy=hy, wavelength=wl, num_rays=4,
                                  distribution="hexapolar")
                for c in ("x", "y", "z", "L", "M", "N", "i", "opd"):
                    out[f"{name}_{tag}_{c}"] = np.asarray(getattr(rays, c))
            except Exception as e:
                print(f"  {name}: trace {tag} failed ({e})")
        print(f"  {name}: ok")
    np.savez(os.path.join(OUT, "samples_deep.npz"), **out)
    print(f"samples_deep.npz: {len(out)} keys")


def geom_deep():
    """Sag/normal grids + ray distances for extra parameter sets of every
    geometry family (reference: tests/test_geometries.py breadth)."""
    from optiland.coordinate_system import CoordinateSystem
    from optiland.geometries import (
        BiconicGeometry, ChebyshevPolynomialGeometry, EvenAsphere,
        OddAsphere, Plane, PolynomialGeometry, StandardGeometry,
        ToroidalGeometry, ZernikePolynomialGeometry,
    )
    from optiland.rays import RealRays

    cs = CoordinateSystem()
    rng = np.random.default_rng(11)
    x = rng.uniform(-8, 8, 40)
    y = rng.uniform(-8, 8, 40)

    C1 = [[0.0, 2e-4, -1e-6], [1e-4, -2e-5, 1e-7], [0.0, 5e-7, 0.0]]
    cases = {
        "plane_0": (Plane(cs), {}),
        "standard_sphere": (StandardGeometry(cs, radius=25.0, conic=0.0), {}),
        "standard_hyper": (StandardGeometry(cs, radius=-60.0, conic=-2.5), {}),
        "standard_oblate": (StandardGeometry(cs, radius=40.0, conic=1.5), {}),
        "even_strong": (
            EvenAsphere(cs, radius=18.0, conic=-0.9,
                        coefficients=[5e-4, -2e-6, 3e-9]), {}),
        "even_flat": (
            EvenAsphere(cs, radius=np.inf, conic=0.0,
                        coefficients=[1e-4, 1e-7]), {}),
        "odd_strong": (
            OddAsphere(cs, radius=30.0, conic=0.3,
                       coefficients=[1e-3, -1e-5, 1e-7]), {}),
        "poly_xy": (
            PolynomialGeometry(cs, radius=45.0, conic=-0.2,
                               coefficients=C1), {}),
        "cheb_1": (
            ChebyshevPolynomialGeometry(cs, radius=45.0, conic=-0.2,
                                        coefficients=C1, norm_x=9,
                                        norm_y=10), {}),
        "zern_1": (
            ZernikePolynomialGeometry(cs, radius=45.0, conic=-0.2,
                                      coefficients=[1e-3, -2e-3, 5e-4,
                                                    3e-4, 1e-4, 2e-4],
                                      norm_radius=10), {}),
        "toroid_1": (
            ToroidalGeometry(cs, radius_x=80.0, radius_y=40.0,
                             conic=-0.5, coeffs_poly_y=[1e-4, -1e-7]), {}),
        "biconic_1": (
            BiconicGeometry(cs, radius_x=70.0, radius_y=45.0,
                            conic_x=-0.3, conic_y=-0.7), {}),
    }
    out = {"x": x, "y": y}
    for tag, (g, _) in cases.items():
        out[f"{tag}_sag"] = np.asarray(g.sag(x, y))
        if tag.startswith("zern"):
            # The reference's analytic Zernike normal disagrees with its own
            # sag by ~1.5e-4 (verified: FD of reference sag vs
            # zernike.py:182-245 analytic). Central differences of the
            # reference sag are the self-consistent ground truth here.
            h = 1e-5
            dzdx = (np.asarray(g.sag(x + h, y)) -
                    np.asarray(g.sag(x - h, y))) / (2 * h)
            dzdy = (np.asarray(g.sag(x, y + h)) -
                    np.asarray(g.sag(x, y - h))) / (2 * h)
            mag = np.sqrt(dzdx**2 + dzdy**2 + 1)
            nx, ny, nz = dzdx / mag, dzdy / mag, -1.0 / mag
        else:
            try:
                nx, ny, nz = g._surface_normal(x, y)
            except Exception:
                rays0 = RealRays(x, y, np.asarray(g.sag(x, y)),
                                 np.zeros_like(x), np.zeros_like(x),
                                 np.ones_like(x), np.ones_like(x),
                                 np.full_like(x, 0.55))
                nx, ny, nz = g.surface_normal(rays0)
        nx, ny, nz = np.asarray(nx), np.asarray(ny), np.asarray(nz)
        # Canonicalize the sign convention to vertex normal -> -z: the
        # reference's Plane returns (0,0,+1) (plane.py:90-109) while its
        # curved geometries converge to (0,0,-1) at the vertex
        # (standard.py:162-175); the overall sign is a convention that
        # cancels in refraction.
        flip = np.where(nz > 0, -1.0, 1.0)
        out[f"{tag}_nx"] = nx * flip
        out[f"{tag}_ny"] = ny * flip
        out[f"{tag}_nz"] = nz * flip
        # oblique ray-distance check
        L = np.full_like(x, 0.08)
        M = np.full_like(x, -0.05)
        N = np.sqrt(1 - L**2 - M**2)
        rays = RealRays(x * 0.6, y * 0.6, np.full_like(x, -12.0), L, M, N,
                        np.ones_like(x), np.full_like(x, 0.55))
        try:
            out[f"{tag}_dist"] = np.asarray(g.distance(rays))
        except Exception as e:
            print(f"  {tag}: distance failed ({e})")
        print(f"  {tag}: ok")
    np.savez(os.path.join(OUT, "geom_deep.npz"), **out)
    print(f"geom_deep.npz: {len(out)} keys")


GLASSES = [
    ("N-BK7", "schott"), ("N-SF11", "schott"), ("SK16", "schott"),
    ("F2", "schott"), ("N-LAK22", "schott"), ("N-SSK2", "schott"),
    ("LF5", "schott"), ("N-BAF10", "schott"), ("SF5", "schott"),
    ("N-SK2", "schott"), ("N-FK51A", "schott"), ("N-LASF44", "schott"),
    ("N-SF5", "schott"), ("N-SK4", "schott"), ("N-SK16", "schott"),
    ("SF11", "schott"), ("N-BAK1", "schott"), ("N-BAK4", "schott"),
    ("N-F2", "schott"), ("LLF1", "schott"),
]


def materials_deep():
    from optiland.materials import Material

    wls = np.array([0.45, 0.5, 0.5876, 0.6563, 0.85])
    out = {"wls": wls}
    for gname, gref in GLASSES:
        try:
            m = Material(gname, gref)
            out[f"{gname}_n"] = np.asarray(m.n(wls), float)
            try:
                out[f"{gname}_k"] = np.asarray(m.k(wls), float)
            except Exception:
                pass
            out[f"{gname}_abbe"] = float(m.abbe())
            print(f"  {gname}: ok")
        except Exception as e:
            print(f"  {gname}: failed ({e})")
    np.savez(os.path.join(OUT, "materials_deep.npz"), **out)
    print(f"materials_deep.npz: {len(out)} keys")


def env_deep():
    from optiland.environment import (
        EnvironmentalConditions, refractive_index_air,
    )

    conds = [
        dict(temperature=15.0, pressure=101325.0, relative_humidity=0.0,
             co2_ppm=450.0),
        dict(temperature=20.0, pressure=101325.0, relative_humidity=0.5,
             co2_ppm=400.0),
        dict(temperature=35.0, pressure=80000.0, relative_humidity=0.8,
             co2_ppm=500.0),
        dict(temperature=-10.0, pressure=120000.0, relative_humidity=0.1,
             co2_ppm=300.0),
        dict(temperature=25.0, pressure=90000.0, relative_humidity=1.0,
             co2_ppm=600.0),
    ]
    wls = np.array([0.4, 0.55, 0.7, 1.0])
    out = {"wls": wls}
    for i, ckw in enumerate(conds):
        c = EnvironmentalConditions(**ckw)
        for model in ("ciddor", "edlen", "birch_downs", "kohlrausch"):
            try:
                vals = [refractive_index_air(w, c, model=model) for w in wls]
                out[f"{model}_{i}"] = np.asarray(vals, float)
            except Exception as e:
                print(f"  {model}/{i}: failed ({e})")
        out[f"cond_{i}"] = np.array([ckw["temperature"], ckw["pressure"],
                                     ckw["relative_humidity"],
                                     ckw["co2_ppm"]])
    np.savez(os.path.join(OUT, "env_deep.npz"), **out)
    print(f"env_deep.npz: {len(out)} keys")


def jones_deep():
    from optiland.jones import (
        JonesHalfWaveRetarder, JonesLinearDiattenuator,
        JonesLinearPolarizer, JonesLinearRetarder,
        JonesQuarterWaveRetarder,
    )
    from optiland.rays import RealRays

    n = 3
    rays = RealRays(np.zeros(n), np.zeros(n), np.zeros(n),
                    np.zeros(n), np.zeros(n), np.ones(n),
                    np.ones(n), np.full(n, 0.55))
    rays.L0 = np.zeros(n)
    rays.M0 = np.zeros(n)
    rays.N0 = np.ones(n)
    out = {}
    th30 = np.radians(30)
    cases = {
        "pol_0": JonesLinearPolarizer([1.0, 0.0, 0.0]),
        "pol_30": JonesLinearPolarizer(
            [np.cos(th30), np.sin(th30), 0.0]
        ),
        "diatt": JonesLinearDiattenuator(t_min=0.3, t_max=0.9,
                                         theta=np.radians(20)),
        "qwp_45": JonesQuarterWaveRetarder(theta=np.radians(45)),
        "hwp_22": JonesHalfWaveRetarder(theta=np.radians(22.5)),
        "ret_60": JonesLinearRetarder(retardance=np.radians(60),
                                      theta=np.radians(10)),
    }
    for tag, j in cases.items():
        try:
            out[tag] = np.asarray(j.calculate_matrix(rays))[0]
            print(f"  {tag}: ok")
        except Exception as e:
            print(f"  {tag}: failed ({e})")
    np.savez(os.path.join(OUT, "jones_deep.npz"), **out)
    print(f"jones_deep.npz: {len(out)} keys")


def analysis_deep():
    """Additional analysis-class regressions on the Cooke triplet."""
    from optiland.analysis import (
        PupilAberration, RmsSpotSizeVsField, RmsWavefrontErrorVsField,
    )
    from optiland.samples.objectives import CookeTriplet

    out = {}
    lens = CookeTriplet()

    # Encircled-energy fractions at fixed radii from a deterministic
    # hexapolar spot (implementation-neutral derivation from trace data).
    radii = np.linspace(0.0, 0.05, 12)[1:]
    out["ee_radii"] = radii
    for fi, (hx, hy) in enumerate(lens.fields.get_field_coords()):
        rays = lens.trace(Hx=hx, Hy=hy, wavelength=0.55, num_rays=8,
                          distribution="hexapolar")
        xx, yy, ii = (np.asarray(a) for a in (rays.x, rays.y, rays.i))
        cx = np.sum(xx * ii) / np.sum(ii)
        cy = np.sum(yy * ii) / np.sum(ii)
        rr = np.hypot(xx - cx, yy - cy)
        frac = np.array([np.sum(ii[rr <= r]) / np.sum(ii) for r in radii])
        out[f"ee_frac_{fi}"] = frac

    rs = RmsSpotSizeVsField(lens, num_fields=12, num_rings=4)
    out["rmsfield_field"] = np.asarray(rs._field[:, 1])
    out["rmsfield_rms"] = np.asarray(rs._spot_size)

    rw = RmsWavefrontErrorVsField(lens, num_fields=10, num_rays=24)
    out["rmswave_field"] = np.asarray(rw._field[:, 1])
    out["rmswave_rms"] = np.asarray(rw._wavefront_error)

    pa = PupilAberration(lens, num_points=17)
    coords = lens.fields.get_field_coords()
    for fi in range(len(coords)):
        for wi, wl in enumerate(lens.wavelengths.get_wavelengths()):
            d = pa.data[f"{coords[fi]}"][f"{wl}"]
            out[f"pa_{fi}_{wi}_x"] = np.asarray(d["x"])
            out[f"pa_{fi}_{wi}_y"] = np.asarray(d["y"])
    out["pa_P"] = np.asarray(pa.data["Py"])

    np.savez(os.path.join(OUT, "analysis_deep.npz"), **out)
    print(f"analysis_deep.npz: {len(out)} keys")


def solves_deep():
    """Solve results: marginal/chief height solves + quick focus on Cooke."""
    from optiland.samples.objectives import CookeTriplet
    from optiland.solves import SolveManager

    out = {}
    for tag, (kind, idx, val) in {
        "mrh0": ("marginal_ray_height", 7, 0.0),
        "mrh05": ("marginal_ray_height", 7, 0.5),
        "crh0": ("chief_ray_height", 7, 0.0),
    }.items():
        lens = CookeTriplet()
        m = SolveManager(lens)
        m.add(kind, idx, val)
        m.apply()
        out[f"{tag}_thickness"] = float(
            np.ravel(lens.surface_group.get_thickness(6))[0]
        )
    lens = CookeTriplet()
    m = SolveManager(lens)
    m.add("quick_focus")
    m.apply()
    out["qf_thickness"] = float(
        np.ravel(lens.surface_group.get_thickness(6))[0]
    )
    np.savez(os.path.join(OUT, "solves_deep.npz"), **out)
    print(f"solves_deep.npz: {len(out)} keys")


def thinfilm_deep():
    from optiland.materials import IdealMaterial
    from optiland.thin_film import ThinFilmStack

    air = IdealMaterial(1.0)
    glass = IdealMaterial(1.52)
    hi = IdealMaterial(2.35)
    lo = IdealMaterial(1.38)
    metal = IdealMaterial(2.0, 0.5)

    wls = np.linspace(0.4, 0.8, 21)
    out = {"wls": wls}

    hr8 = ThinFilmStack(incident_material=air, substrate_material=glass)
    for i in range(8):
        m = hi if i % 2 == 0 else lo
        hr8.add_layer(m, 0.55 / (4 * float(np.ravel(m.n(0.55))[0])))
    single = ThinFilmStack(incident_material=air, substrate_material=glass)
    single.add_layer(hi, 0.55 / (4 * 2.35))
    metal1 = ThinFilmStack(incident_material=air, substrate_material=glass)
    metal1.add_layer(metal, 0.04)

    for tag, st in {"hr8": hr8, "single_hi": single,
                    "metal1": metal1}.items():
        for ang_deg in (0.0, 30.0, 60.0):
            aoi = np.deg2rad(ang_deg)
            for pol in ("s", "p"):
                try:
                    out[f"{tag}_R_{pol}_{int(ang_deg)}"] = np.asarray(
                        [float(st.reflectance(w, aoi, pol)) for w in wls]
                    )
                    out[f"{tag}_T_{pol}_{int(ang_deg)}"] = np.asarray(
                        [float(st.transmittance(w, aoi, pol)) for w in wls]
                    )
                    out[f"{tag}_A_{pol}_{int(ang_deg)}"] = np.asarray(
                        [float(st.absorptance(w, aoi, pol)) for w in wls]
                    )
                except Exception as e:
                    print(f"  {tag}/{pol}/{ang_deg}: failed ({e})")
        print(f"  {tag}: ok")
    np.savez(os.path.join(OUT, "thinfilm_deep.npz"), **out)
    print(f"thinfilm_deep.npz: {len(out)} keys")


def zernike_deep():
    """Per-term Zernike values on a polar grid for all 3 conventions."""
    from optiland.zernike import ZernikeFringe, ZernikeNoll, ZernikeStandard

    rng = np.random.default_rng(7)
    r = rng.uniform(0, 1, 25)
    phi = rng.uniform(0, 2 * np.pi, 25)
    out = {"r": r, "phi": phi}
    for name, cls in (("standard", ZernikeStandard),
                      ("fringe", ZernikeFringe), ("noll", ZernikeNoll)):
        z = cls(coeffs=np.ones(36))
        out[f"{name}_terms"] = np.stack(
            [np.asarray(t) for t in z.terms(r, phi)]
        )
        print(f"  {name}: ok")
    np.savez(os.path.join(OUT, "zernike_deep.npz"), **out)
    print(f"zernike_deep.npz: {len(out)} keys")



SECTIONS = {
    "samples": samples_deep,
    "geom": geom_deep,
    "materials": materials_deep,
    "env": env_deep,
    "jones": jones_deep,
    "analysis": analysis_deep,
    "solves": solves_deep,
    "thinfilm": thinfilm_deep,
    "zernike": zernike_deep,
}

if __name__ == "__main__":
    which = sys.argv[1:] or list(SECTIONS)
    for w in which:
        print(f"== {w} ==")
        try:
            SECTIONS[w]()
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"section {w} FAILED: {e}")
