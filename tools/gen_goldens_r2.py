"""Round-2 golden generation: run the reference implementation over the
file-I/O corpus and the analysis suite, dumping arrays the parity tests
compare against (companion to gen_goldens.py).

Usage: python tools/gen_goldens_r2.py
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

# numba is optional JIT in the reference; stub it
numba_stub = types.ModuleType("numba")
numba_stub.jit = lambda *a, **k: (a[0] if a and callable(a[0]) else (lambda f: f))
numba_stub.njit = numba_stub.jit
numba_stub.prange = range
sys.modules.setdefault("numba", numba_stub)
sys.modules.setdefault("vtk", types.ModuleType("vtk"))

sys.path.insert(0, "/root/reference")

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
ZDIR = "/root/reference/tests/zemax_files"
CDIR = "/root/reference/tests/test_fileio/codev_files"


def file_goldens():
    """f2 + traced marginal fan for every golden .zmx / .seq file."""
    from optiland.fileio import load_codev_file, load_zemax_file

    out = {}

    def record(tag, lens):
        try:
            out[f"{tag}_f2"] = float(np.ravel(lens.paraxial.f2())[0])
        except Exception:
            pass
        out[f"{tag}_nsurf"] = lens.surface_group.num_surfaces
        try:
            rays = lens.trace(Hx=0.0, Hy=0.0,
                              wavelength=lens.primary_wavelength,
                              num_rays=4, distribution="hexapolar")
            for c in ("x", "y", "z", "L", "M", "N", "opd"):
                out[f"{tag}_{c}"] = np.asarray(getattr(rays, c))
        except Exception as e:
            print(f"  {tag}: trace failed ({e})")

    for fname in sorted(os.listdir(ZDIR)):
        if not fname.endswith(".zmx"):
            continue
        tag = "zmx_" + fname[:-4]
        try:
            lens = load_zemax_file(os.path.join(ZDIR, fname))
        except Exception as e:
            print(f"  {fname}: load failed ({e})")
            continue
        record(tag, lens)

    for fname in sorted(os.listdir(CDIR)):
        if not fname.endswith(".seq"):
            continue
        tag = "seq_" + fname[:-4]
        try:
            lens = load_codev_file(os.path.join(CDIR, fname))
        except Exception as e:
            print(f"  {fname}: load failed ({e})")
            continue
        record(tag, lens)

    np.savez_compressed(os.path.join(OUT, "file_corpus.npz"), **out)
    print(f"file_corpus: {len(out)} arrays")


def analysis_goldens():
    """Numerical regression values for the analysis suite on the Cooke."""
    from optiland.analysis import (
        Distortion,
        EncircledEnergy,
        FieldCurvature,
        GridDistortion,
        PupilAberration,
        RayFan,
        RmsSpotSizeVsField,
        RmsWavefrontErrorVsField,
        SpotDiagram,
        ThroughFocusSpotDiagram,
        YYbar,
    )
    from optiland.samples.objectives import CookeTriplet

    lens = CookeTriplet()
    out = {}

    spot = SpotDiagram(lens)
    out["spot_rms"] = np.asarray(
        [[float(v) for v in row] for row in spot.rms_spot_radius()]
    )
    out["spot_geo"] = np.asarray(
        [[float(v) for v in row] for row in spot.geometric_spot_radius()]
    )
    out["spot_centroid"] = np.asarray(
        [[float(c[0]), float(c[1])] for c in spot.centroid()]
    )

    d = Distortion(lens, num_points=32)
    out["distortion"] = np.stack([np.ravel(np.asarray(v)) for v in d.data])

    fc = FieldCurvature(lens, num_points=32)
    out["field_curv"] = np.stack(
        [np.stack([np.ravel(np.asarray(t)) for t in pair]) for pair in fc.data]
    )

    gd = GridDistortion(lens, num_points=8)
    out["grid_xp"] = np.asarray(gd.data["xp"])
    out["grid_yp"] = np.asarray(gd.data["yp"])
    out["grid_max"] = float(gd.data["max_distortion"])

    fan = RayFan(lens, num_points=32)
    out["fan_Px"] = np.asarray(fan.data["Px"])
    for fk, fval in (("f0", "(0.0, 0.0)"), ("f1", "(0.0, 1.0)")):
        for wl in ("0.48", "0.55", "0.65"):
            try:
                out[f"fan_{fk}_{wl}_y"] = np.asarray(fan.data[fval][wl]["y"])
                out[f"fan_{fk}_{wl}_x"] = np.asarray(fan.data[fval][wl]["x"])
            except Exception as e:
                print(f"  fan {fval} {wl}: {e}")

    yy = YYbar(lens)
    out["yybar_ya"] = np.ravel(np.asarray(yy.data["ya"]))
    out["yybar_yb"] = np.ravel(np.asarray(yy.data["yb"]))

    pa = PupilAberration(lens, num_points=16)
    d0 = pa.data["(0.0, 1.0)"]["0.55"]
    out["pupil_ab_x"] = np.asarray(d0["x"], dtype=float)
    out["pupil_ab_y"] = np.asarray(d0["y"], dtype=float)
    out["pupil_ab_Py"] = np.asarray(pa.data["Py"], dtype=float)

    rs = RmsSpotSizeVsField(lens, num_fields=8)
    out["rms_field_spot"] = np.asarray(rs._spot_size)

    rw = RmsWavefrontErrorVsField(lens, num_fields=8, num_rays=16)
    out["rms_field_wave"] = np.asarray(rw._wavefront_error)

    tf = ThroughFocusSpotDiagram(lens, delta_focus=0.05, num_steps=3,
                                 num_rings=4)
    out["tf_positions"] = np.asarray(
        [float(np.ravel(r)[0]) for r in tf.positions]
    )
    # per position/field/wavelength RMS about the centroid, computed
    # directly from the stored spot coordinates (deterministic)
    rms = []
    for step in tf.results:
        srow = []
        for field_data in step:
            wrow = []
            for sd in field_data:
                x = np.ravel(np.asarray(sd.x))
                y = np.ravel(np.asarray(sd.y))
                m = np.ravel(np.asarray(sd.intensity)) > 0
                cx, cy = x[m].mean(), y[m].mean()
                wrow.append(
                    float(np.sqrt(((x[m]-cx)**2 + (y[m]-cy)**2).mean()))
                )
            srow.append(wrow)
        rms.append(srow)
    out["tf_rms"] = np.asarray(rms)

    np.savez_compressed(os.path.join(OUT, "analysis_reg.npz"), **out)
    print(f"analysis_reg: {len(out)} arrays")


def zernike_env_goldens():
    """Zernike fits of a synthetic OPD + air-index environment models."""
    out = {}
    from optiland.zernike import ZernikeFit

    rng = np.random.default_rng(42)
    n = 400
    r = np.sqrt(rng.uniform(size=n))
    th = rng.uniform(0, 2 * np.pi, n)
    x, y = r * np.cos(th), r * np.sin(th)
    z = (
        0.5
        + 0.3 * x
        - 0.2 * y
        + 0.7 * (2 * r**2 - 1)
        + 0.1 * (r**2 * np.cos(2 * th))
        + 0.05 * rng.normal(size=n)
    )
    for zt in ("standard", "fringe", "noll"):
        fit = ZernikeFit(x, y, z, zernike_type=zt, num_terms=16)
        out[f"zfit_{zt}"] = np.asarray(fit.coeffs)
    out["zfit_x"] = x
    out["zfit_y"] = y
    out["zfit_z"] = z

    from optiland.environment import (
        EnvironmentalConditions,
        refractive_index_air,
    )

    temps = np.array([0.0, 15.0, 20.0, 35.0])
    press = np.array([80000.0, 101325.0, 110000.0])
    for model in ("ciddor", "edlen", "birch_downs", "kohlrausch"):
        vals = []
        for T in temps:
            for P in press:
                cond = EnvironmentalConditions(
                    temperature=T, pressure=P, relative_humidity=0.4,
                    co2_ppm=450.0,
                )
                vals.append(refractive_index_air(0.55, cond, model=model))
        out[f"air_{model}"] = np.asarray(vals, dtype=float)
    out["air_temps"] = temps
    out["air_press"] = press

    np.savez_compressed(os.path.join(OUT, "zernike_env.npz"), **out)
    print(f"zernike_env: {len(out)} arrays")


def thin_film_goldens():
    """R/T spectra of reference coating stacks vs wavelength and AOI."""
    from optiland.thin_film import ThinFilmStack
    from optiland.materials import IdealMaterial

    out = {}
    air = IdealMaterial(1.0)
    glass = IdealMaterial(1.52)
    mgf2 = IdealMaterial(1.38)
    zns = IdealMaterial(2.35)

    # quarter-wave MgF2 AR coat at 550 nm
    stack = ThinFilmStack(incident_material=air, substrate_material=glass)
    stack.add_layer(mgf2, 0.55 / (4 * 1.38))
    wls = np.linspace(0.4, 0.7, 31)
    for pol in ("s", "p"):
        for aoi_deg in (0.0, 30.0, 60.0):
            aoi = np.deg2rad(aoi_deg)
            R = [float(stack.reflectance(wl, aoi, pol)) for wl in wls]
            T = [float(stack.transmittance(wl, aoi, pol)) for wl in wls]
            out[f"ar_R_{pol}_{int(aoi_deg)}"] = np.asarray(R)
            out[f"ar_T_{pol}_{int(aoi_deg)}"] = np.asarray(T)

    # 4-layer high-reflector (HL)^2
    hr = ThinFilmStack(incident_material=air, substrate_material=glass)
    for _ in range(2):
        hr.add_layer(zns, 0.55 / (4 * 2.35))
        hr.add_layer(mgf2, 0.55 / (4 * 1.38))
    out["hr_R_s_0"] = np.asarray(
        [float(hr.reflectance(wl, 0.0, "s")) for wl in wls]
    )
    out["wls"] = wls
    np.savez_compressed(os.path.join(OUT, "thin_film_reg.npz"), **out)
    print(f"thin_film_reg: {len(out)} arrays")


def distribution_apodization_goldens():
    """Pupil distributions and apodization weights from the reference."""
    from optiland.distribution import create_distribution

    out = {}
    for name in (
        "line_x", "line_y", "positive_line_x", "positive_line_y",
        "uniform", "hexapolar", "ring", "cross",
    ):
        try:
            d = create_distribution(name)
            d.generate_points(8)
            out[f"dist_{name}_x"] = np.asarray(d.x)
            out[f"dist_{name}_y"] = np.asarray(d.y)
        except Exception as e:
            print(f"  distribution {name}: {e}")

    from optiland import apodization as apod_mod

    px = np.linspace(-1, 1, 21)
    py = np.linspace(1, -1, 21)
    for cls_name in dir(apod_mod):
        cls = getattr(apod_mod, cls_name)
        if not (isinstance(cls, type) and cls_name.endswith("Apodization")):
            continue
        if cls_name.startswith("Base"):
            continue
        try:
            a = cls()
        except Exception:
            try:
                a = cls(coeff=0.5)
            except Exception:
                continue
        try:
            out[f"apod_{cls_name}"] = np.asarray(a.get_intensity(px, py))
        except Exception as e:
            print(f"  apodization {cls_name}: {e}")

    np.savez_compressed(os.path.join(OUT, "dist_apod.npz"), **out)
    print(f"dist_apod: {len(out)} arrays")


def main():
    os.makedirs(OUT, exist_ok=True)
    file_goldens()
    analysis_goldens()
    zernike_env_goldens()
    thin_film_goldens()
    distribution_apodization_goldens()


if __name__ == "__main__":
    main()
