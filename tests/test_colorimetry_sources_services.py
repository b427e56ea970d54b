"""Colorimetry, extended sources, image simulation, detector analyses, and
the headless services layer (reference: optiland/colorimetry/, sources/,
analysis/image_simulation/, analysis/irradiance.py, intensity.py,
angle_vs_height.py, mtf_vs_field.py, optiland_gui/services/)."""

from __future__ import annotations

import numpy as np
import pytest

from optiland_tpu.samples import CookeTriplet
from tests.conftest import assert_allclose


class TestColorimetry:
    def test_spectrum_to_xyz_golden(self, goldens):
        from optiland_tpu.colorimetry import spectrum_to_xyz

        g = goldens("colorimetry")
        wl = g["wl"]
        spec = g["spec"]
        xyz = spectrum_to_xyz(wl, spec)
        assert_allclose(np.asarray(xyz), g["xyz"], rtol=1e-9)
        xyz10 = spectrum_to_xyz(wl, spec, observer="10deg")
        assert_allclose(np.asarray(xyz10), g["xyz10"], rtol=1e-9)

    def test_srgb_golden(self, goldens):
        from optiland_tpu.colorimetry import xyz_to_srgb, xyz_to_xyY

        g = goldens("colorimetry")
        rgb = [int(v) for v in xyz_to_srgb(*g["xyz"])]
        assert rgb == [int(v) for v in g["srgb"]]
        xyY = np.asarray(xyz_to_xyY(*g["xyz"]), dtype=float)
        assert_allclose(xyY, g["xyY"], rtol=1e-9)

    def test_spectrum_range_validation(self):
        from optiland_tpu.colorimetry import spectrum_to_xyz

        with pytest.raises(ValueError, match="visible range"):
            spectrum_to_xyz([400, 500, 600], [1, 1, 1])

    def test_white_point(self):
        from optiland_tpu.colorimetry import spectrum_to_xyz

        wl = np.linspace(360, 830, 100)
        X, Y, Z = spectrum_to_xyz(wl, np.ones_like(wl))
        assert abs(Y - 100.0) < 1e-6  # perfect reflector -> Y = 100


class TestSMFSource:
    def test_statistics(self):
        from optiland_tpu.sources import SMFSource

        src = SMFSource(mfd_um=10.4, wavelength_um=1.55, seed=3)
        rays = src.generate_rays(2000)  # rounds up to 2048
        x = np.asarray(rays.x)
        assert x.shape[0] == 2048
        assert abs(x.std() / src.sigma_spatial_mm - 1) < 0.05
        assert abs(float(np.sum(np.asarray(rays.i))) - 1.0) < 1e-9
        norm = np.asarray(rays.L) ** 2 + np.asarray(rays.M) ** 2 + np.asarray(
            rays.N) ** 2
        assert_allclose(norm, np.ones_like(norm), rtol=1e-12)

    def test_auto_divergence(self):
        from optiland_tpu.sources import SMFSource

        src = SMFSource(mfd_um=10.4, wavelength_um=1.55)
        expect = 2 * np.degrees(1.55 / (np.pi * 5.2))
        assert abs(src.divergence_deg_1e2 - expect) < 1e-9

    def test_point_source_and_position(self):
        from optiland_tpu.sources import SMFSource

        src = SMFSource(mfd_um=10.4, wavelength_um=1.55, seed=1,
                        is_point_source=True, position=(1.0, -2.0, 3.0))
        rays = src.generate_rays(64)
        assert_allclose(np.asarray(rays.x), np.full(64, 1.0), atol=1e-12)
        assert_allclose(np.asarray(rays.y), np.full(64, -2.0), atol=1e-12)

    def test_extended_source_optic_traces(self):
        from optiland_tpu.sources import ExtendedSourceOptic, SMFSource

        src = SMFSource(mfd_um=50.0, wavelength_um=0.55, seed=5)
        eso = ExtendedSourceOptic(CookeTriplet(), src)
        final, path = eso.trace(num_rays=256)
        assert np.isfinite(np.asarray(final.y)).all()
        assert np.asarray(path["y"]).shape[0] == 8  # surfaces incl. object


class TestImageSimulation:
    def test_basis_and_blur(self):
        from optiland_tpu.analysis import (
            PSFBasisGenerator,
            SpatiallyVariableSimulator,
        )

        lens = CookeTriplet()
        gen = PSFBasisGenerator(lens, 0.55, grid_shape=(3, 3), num_rays=32,
                                psf_grid_size=64)
        eigen, coeffs, mean_psf = gen.generate_basis(n_components=2)
        assert eigen.shape == (2, 64, 64)
        assert coeffs.shape == (2, 3, 3)
        img = np.zeros((64, 64))
        img[28:36, 28:36] = 1.0
        cmap = gen.resize_coefficient_map(coeffs, (64, 64))
        out = SpatiallyVariableSimulator().simulate(img, eigen, cmap, mean_psf)
        assert np.isfinite(np.asarray(out)).all()
        # mean-PSF blur conserves most energy away from the borders
        assert float(np.sum(np.asarray(out))) > 0.5 * img.sum()

    def test_distortion_warper_identity_region(self):
        from optiland_tpu.analysis import DistortionWarper

        lens = CookeTriplet()
        warper = DistortionWarper(lens)
        grid = warper.generate_distortion_map(0.55, (32, 32))
        assert grid.shape == (1, 32, 32, 2)
        img = np.random.RandomState(0).rand(32, 32)
        warped = warper.warp_image(img, grid)
        assert np.isfinite(np.asarray(warped)).all()
        assert float(np.abs(np.asarray(warped)).max()) > 0

    def test_engine_runs(self):
        from optiland_tpu.analysis import ImageSimulationEngine

        img = np.zeros((48, 48))
        img[20:28, 20:28] = 1.0
        eng = ImageSimulationEngine(
            CookeTriplet(), img,
            config={"psf_grid_shape": (2, 2), "num_rays": 32, "psf_size": 32,
                    "n_components": 1, "padding": 8},
        )
        out = eng.run()
        assert np.asarray(out).shape[:2] == (48, 48)
        assert np.isfinite(np.asarray(out)).all()


class TestDetectors:
    def _lens(self):
        from optiland_tpu.physical_apertures import RectangularAperture

        lens = CookeTriplet()
        lens.surfaces.surfaces[-1].aperture = RectangularAperture(
            -12, 12, -12, 12
        )
        lens._invalidate()
        return lens

    def test_irradiance_power_conservation(self):
        from optiland_tpu.analysis import IncoherentIrradiance

        irr = IncoherentIrradiance(
            self._lens(), num_rays=3000, res=(24, 24), fields=[(0, 0)],
            wavelengths=[0.55],
        )
        m, xe, ye = irr.data[0][0]
        total = float(np.sum(np.asarray(m))) * (xe[1] - xe[0]) * (
            ye[1] - ye[0])
        assert abs(total / 3000 - 1) < 0.05  # unit-power rays land on chip
        assert irr.peak_irradiance()[0][0] > 0

    def test_irradiance_requires_aperture(self):
        from optiland_tpu.analysis import IncoherentIrradiance

        with pytest.raises(ValueError, match="aperture"):
            IncoherentIrradiance(CookeTriplet(), fields=[(0, 0)],
                                 wavelengths=[0.55])

    def test_radiant_intensity(self):
        from optiland_tpu.analysis import RadiantIntensity

        ri = RadiantIntensity(
            self._lens(), num_rays=2000, num_angular_bins_X=16,
            num_angular_bins_Y=16, angle_X_min=-20, angle_X_max=20,
            angle_Y_min=-20, angle_Y_max=20, fields=[(0, 0)],
            wavelengths=[0.55], use_absolute_units=True,
        )
        pm, _, _ = ri.data[0][0]
        assert np.isfinite(np.asarray(pm)).all()
        assert ri.peak_intensity_values()[0][0] > 0

    def test_angle_vs_height_scans(self):
        from optiland_tpu.analysis import (
            FieldIncidentAngleVsHeight,
            PupilIncidentAngleVsHeight,
        )

        lens = CookeTriplet()
        pa = PupilIncidentAngleVsHeight(lens, field=(0, 0.7), num_points=16)
        d = list(pa.data.values())[0]
        assert d["height"].shape == (16,)
        assert np.isfinite(d["angle"]).all()
        fa = FieldIncidentAngleVsHeight(lens, pupil=(0, 0), num_points=16)
        d2 = list(fa.data.values())[0]
        # full-field chief ray lands at ~18.1 mm on the Cooke triplet
        assert abs(d2["height"].max() - 18.136) < 0.05

    def test_mtf_vs_field(self):
        from optiland_tpu.analysis import MTFvsField

        mf = MTFvsField(CookeTriplet(), frequencies=[10], num_fields=4,
                        wavelengths=[0.55], num_rays=32)
        t = np.asarray(mf.data[0][0]["tangential"])
        assert np.isfinite(t).all() and (t <= 1.001).all() and (t > 0).all()

    def test_mtf_vs_field_limit(self):
        from optiland_tpu.analysis import MTFvsField

        with pytest.raises(ValueError, match="override_limits"):
            MTFvsField(CookeTriplet(), frequencies=[1, 2, 3, 4, 5, 6])

    def test_surface_sag_viewer(self):
        import matplotlib

        matplotlib.use("Agg")
        from optiland_tpu.analysis import SurfaceSagViewer

        fig, axs = SurfaceSagViewer(CookeTriplet()).view(1)
        assert fig is not None


class TestServices:
    def test_lde_editing_and_undo(self):
        from optiland_tpu.services import OptilandConnector

        c = OptilandConnector()
        assert c.surfaces.get_surface_count() == 3
        c.surfaces.set_surface_data(1, 2, 40.0)
        c.surfaces.set_surface_data(1, 4, "N-BK7")
        c.surfaces.add_surface()
        c.surfaces.set_surface_data(2, 2, -40.0)
        c.surfaces.set_surface_data(2, 3, 30.0)
        assert c.surfaces.get_surface_data(2, 3) == 30.0
        c.undo()
        assert c.surfaces.get_surface_data(2, 3) == 0.0
        c.redo()
        assert c.surfaces.get_surface_data(2, 3) == 30.0

    def test_remove_protects_object_image(self):
        from optiland_tpu.services import OptilandConnector

        c = OptilandConnector()
        with pytest.raises(ValueError):
            c.surfaces.remove_surface(0)
        with pytest.raises(ValueError):
            c.surfaces.remove_surface(c.surfaces.get_surface_count() - 1)

    def test_analysis_runner_registry(self):
        from optiland_tpu.services import OptilandConnector

        c = OptilandConnector(CookeTriplet())
        reg = c.analysis.get_analysis_registry()
        assert "SpotDiagram" in reg and "FFTPSF" in reg
        res = c.analysis.run("SpotDiagram", wavelengths=[0.55], num_rings=4)
        assert c.analysis.get_result() is res

    def test_optimization_service(self):
        from optiland_tpu.services import OptilandConnector

        c = OptilandConnector()
        c.surfaces.set_surface_data(1, 2, 40.0)
        c.surfaces.set_surface_data(1, 4, "N-BK7")
        c.surfaces.set_surface_data(1, 3, 5.0)
        c.surfaces.add_surface()
        c.surfaces.set_surface_data(2, 2, -40.0)
        c.surfaces.set_surface_data(2, 3, 30.0)
        c.optimization.build_problem(
            operands=[{"type": "f2", "target": 45.0}],
            variables=[{"type": "radius", "surface_number": 1}],
        )
        res = c.optimization.run("generic", maxiter=40)
        assert float(res.fun) < 1e-8

    def test_file_service_roundtrip(self, tmp_path):
        from optiland_tpu.services import OptilandConnector

        c = OptilandConnector(CookeTriplet())
        path = str(tmp_path / "sys.json")
        c.file.save(path)
        c2 = OptilandConnector()
        c2.file.load(path)
        f1 = float(np.ravel(c.get_optic().paraxial.f2())[0])
        f2 = float(np.ravel(c2.get_optic().paraxial.f2())[0])
        assert abs(f1 - f2) < 1e-9
