"""Apodization profiles and the headless services layer
(reference: tests/test_apodization.py-style coverage of
optiland/apodization/, and optiland_gui/optiland_connector.py behavior)."""

import numpy as np
import pytest

from optiland_tpu.apodization import (
    BaseApodization,
    CosineSquaredApodization,
    GaussianApodization,
    HannApodization,
    PolynomialApodization,
    SuperGaussianApodization,
    TukeyApodization,
    UniformApodization,
)
from optiland_tpu.services import OptilandConnector, UndoRedoManager

PX = np.linspace(-1.0, 1.0, 21)
PY = np.zeros(21)


# -- apodization profiles -----------------------------------------------------


def test_uniform_is_one_everywhere():
    np.testing.assert_allclose(
        np.asarray(UniformApodization().get_intensity(PX, PY)), 1.0
    )


def test_gaussian_peak_and_falloff():
    g = np.asarray(GaussianApodization(sigma=0.5).get_intensity(PX, PY))
    assert g[10] == pytest.approx(1.0)  # center
    assert g[0] == pytest.approx(np.exp(-1 / (2 * 0.25)), rel=1e-12)
    assert np.all(np.diff(g[:11]) > 0)  # monotone rise to center


def test_tukey_flat_top_and_taper():
    t = np.asarray(TukeyApodization(R=1.0, alpha=0.5).get_intensity(PX, PY))
    assert t[10] == pytest.approx(1.0)
    assert t[0] == pytest.approx(0.0, abs=1e-12)  # edge tapers to zero
    assert t[7] == pytest.approx(1.0)  # inside the flat region (r=0.3)


def test_hann_window_shape():
    # A(r) = 0.5*(1 - cos(2 pi r / D)) for r < D/2, else 0 — zero at the
    # center, rising toward the edge (reference: apodization/hann.py:10-15).
    h = np.asarray(HannApodization(D=2.0).get_intensity(PX, PY))
    assert h[10] == pytest.approx(0.0, abs=1e-12)
    assert h[0] == pytest.approx(0.0, abs=1e-12)  # r = 1 >= D/2 cut
    r = abs(PX[19])
    assert h[19] == pytest.approx(0.5 * (1 - np.cos(2 * np.pi * r / 2.0)))


def test_polynomial_profile():
    p = np.asarray(PolynomialApodization(R=1.0, p=2.0).get_intensity(PX, PY))
    assert p[10] == pytest.approx(1.0)
    np.testing.assert_allclose(p, (1 - np.clip(PX**2, 0, 1)) ** 2, atol=1e-12)


def test_cosine_squared_profile():
    c = np.asarray(CosineSquaredApodization(R=1.0).get_intensity(PX, PY))
    assert c[10] == pytest.approx(1.0)
    assert c[0] == pytest.approx(0.0, abs=1e-12)


def test_super_gaussian_order_sharpens():
    g2 = np.asarray(SuperGaussianApodization(w=0.7, n=2).get_intensity(PX, PY))
    g8 = np.asarray(SuperGaussianApodization(w=0.7, n=8).get_intensity(PX, PY))
    # higher order -> flatter top, steeper edge
    assert g8[12] > g2[12]


def test_all_apodizations_bounded():
    for apo in (UniformApodization(), GaussianApodization(0.4),
                TukeyApodization(1.0, 0.3), HannApodization(2.0),
                PolynomialApodization(1.0, 3.0),
                CosineSquaredApodization(1.0),
                SuperGaussianApodization(0.5, 4.0)):
        v = np.asarray(apo.get_intensity(PX, PY))
        assert (v >= -1e-12).all() and (v <= 1 + 1e-12).all(), type(apo)


def test_apodization_dict_round_trip():
    for apo in (GaussianApodization(0.4), TukeyApodization(0.9, 0.3),
                HannApodization(1.8), PolynomialApodization(1.0, 3.0),
                CosineSquaredApodization(0.8),
                SuperGaussianApodization(0.5, 4.0), UniformApodization()):
        apo2 = BaseApodization.from_dict(apo.to_dict())
        np.testing.assert_allclose(
            np.asarray(apo2.get_intensity(PX, PY)),
            np.asarray(apo.get_intensity(PX, PY)),
            atol=1e-12,
        )


# -- undo/redo manager --------------------------------------------------------


def test_undo_redo_round_trip():
    mgr = UndoRedoManager()
    mgr.add_state({"v": 1})
    prev = mgr.undo({"v": 2})
    assert prev == {"v": 1}
    nxt = mgr.redo(prev)
    assert nxt == {"v": 2}


def test_undo_empty_returns_none():
    mgr = UndoRedoManager()
    assert mgr.undo({"v": 1}) is None
    assert not mgr.can_undo()


def test_redo_cleared_by_new_state():
    mgr = UndoRedoManager()
    mgr.add_state({"v": 1})
    mgr.undo({"v": 2})
    assert mgr.can_redo()
    mgr.add_state({"v": 3})
    assert not mgr.can_redo()


def test_undo_limit_drops_oldest():
    mgr = UndoRedoManager(limit=3)
    for i in range(5):
        mgr.add_state({"v": i})
    assert len(mgr._undo) == 3
    assert mgr._undo[0] == {"v": 2}


# -- connector ----------------------------------------------------------------


def test_connector_surface_service_edit_cycle():
    from optiland_tpu.samples import CookeTriplet

    c = OptilandConnector(CookeTriplet())
    n0 = c.surfaces.get_surface_count()
    c.surfaces.add_surface(index=2)
    assert c.surfaces.get_surface_count() == n0 + 1
    c.surfaces.remove_surface(2)
    assert c.surfaces.get_surface_count() == n0


def test_connector_undo_redo_restores_radius():
    from optiland_tpu.samples import CookeTriplet

    c = OptilandConnector(CookeTriplet())
    r0 = c.get_optic().surfaces.surfaces[1].radius
    c.snapshot()
    c.get_optic().set_radius(99.0, 1)
    c.undo()
    assert c.get_optic().surfaces.surfaces[1].radius == pytest.approx(r0)
    c.redo()
    assert c.get_optic().surfaces.surfaces[1].radius == pytest.approx(99.0)


def test_connector_event_subscription():
    from optiland_tpu.samples import CookeTriplet

    c = OptilandConnector(CookeTriplet())
    seen = []
    c.subscribe("modified", lambda **kw: seen.append(kw))
    c.notify("modified", source="test")
    assert seen and seen[0]["source"] == "test"


def test_system_service_setters():
    from optiland_tpu.samples import CookeTriplet

    c = OptilandConnector(CookeTriplet())
    c.system.set_aperture("EPD", 8.0)
    assert c.get_optic().aperture.value == 8.0
    c.system.add_wavelength(0.6328)
    assert 0.6328 in c.get_optic().wavelengths.get_wavelengths()


def test_analysis_registry_is_broad():
    from optiland_tpu.samples import CookeTriplet

    c = OptilandConnector(CookeTriplet())
    registry = c.analysis.get_analysis_registry()
    assert len(registry) > 15
    assert "FFTPSF" in registry and "GeometricMTF" in registry
