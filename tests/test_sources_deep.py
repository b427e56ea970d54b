"""Extended-source behavior: SMF sampling statistics, power bookkeeping,
rounding rules, point-source mode, positioning
(reference: tests/test_extended_sources.py, optiland/sources/smf.py)."""

import math

import numpy as np
import pytest

from optiland_tpu.sources import SMFSource


def _src(**kw):
    defaults = dict(mfd_um=10.4, wavelength_um=1.55, seed=0)
    defaults.update(kw)
    return SMFSource(**defaults)


# -- construction / derived quantities ------------------------------------------


def test_default_divergence_from_gaussian_beam():
    s = _src()
    w0 = 10.4 / 2.0
    theta = 1.55 / (math.pi * w0)
    assert s.divergence_deg_1e2 == pytest.approx(2 * math.degrees(theta))


def test_explicit_divergence_overrides():
    s = _src(divergence_deg_1e2=12.0)
    assert s.divergence_deg_1e2 == 12.0


def test_sigma_spatial_mm():
    s = _src()
    assert s.sigma_spatial_mm == pytest.approx((10.4 / 2) * 1e-3 / 2)


def test_sigma_angular_rad():
    s = _src(divergence_deg_1e2=10.0)
    assert s.sigma_angular_rad == pytest.approx(math.radians(5.0) / 2)


def test_attributes_stored():
    s = _src(total_power=2.5, position=(1.0, -2.0, 3.0))
    assert s.total_power == 2.5
    assert s.position == (1.0, -2.0, 3.0)


# -- ray generation ---------------------------------------------------------------


def test_generate_rounds_up_to_power_of_two():
    r = _src().generate_rays(100)
    assert r.num_rays == 128


def test_generate_exact_power_of_two():
    r = _src().generate_rays(256)
    assert r.num_rays == 256


def test_generate_one_ray():
    r = _src().generate_rays(1)
    assert r.num_rays == 1


@pytest.mark.parametrize("bad", [0, -5])
def test_generate_invalid_counts_raise(bad):
    with pytest.raises(ValueError, match="positive"):
        _src().generate_rays(bad)


def test_direction_cosines_normalized():
    r = _src().generate_rays(512)
    norm = np.asarray(r.L**2 + r.M**2 + r.N**2)
    np.testing.assert_allclose(norm, 1.0, atol=1e-12)


def test_rays_propagate_forward():
    r = _src().generate_rays(512)
    assert (np.asarray(r.N) > 0).all()


def test_wavelength_uniform():
    r = _src().generate_rays(64)
    np.testing.assert_allclose(np.asarray(r.w), 1.55)


def test_total_power_conserved():
    s = _src(total_power=3.0)
    r = s.generate_rays(200)  # rounds to 256
    assert float(np.sum(np.asarray(r.i))) == pytest.approx(3.0, rel=1e-12)


def test_spatial_spread_matches_sigma():
    s = _src()
    r = s.generate_rays(8192)
    std_x = float(np.std(np.asarray(r.x)))
    assert std_x == pytest.approx(s.sigma_spatial_mm, rel=0.05)


def test_angular_spread_matches_sigma():
    s = _src(divergence_deg_1e2=10.0)
    r = s.generate_rays(8192)
    theta_x = np.arctan(np.asarray(r.L) / np.asarray(r.N))
    assert float(np.std(theta_x)) == pytest.approx(s.sigma_angular_rad,
                                                   rel=0.05)


def test_point_source_zero_spatial_extent():
    s = _src(is_point_source=True)
    r = s.generate_rays(128)
    np.testing.assert_allclose(np.asarray(r.x), 0.0)
    np.testing.assert_allclose(np.asarray(r.y), 0.0)
    # angular distribution still extended
    assert float(np.std(np.asarray(r.L))) > 0


def test_position_offset_applied():
    s = _src(position=(2.0, -1.0, 5.0), is_point_source=True)
    r = s.generate_rays(32)
    np.testing.assert_allclose(np.asarray(r.x), 2.0)
    np.testing.assert_allclose(np.asarray(r.y), -1.0)
    np.testing.assert_allclose(np.asarray(r.z), 5.0)


def test_seed_reproducibility():
    r1 = _src(seed=7).generate_rays(64)
    r2 = _src(seed=7).generate_rays(64)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x))
    r3 = _src(seed=8).generate_rays(64)
    assert not np.allclose(np.asarray(r1.x), np.asarray(r3.x))


def test_repr_contains_key_info():
    s = _src()
    text = repr(s)
    assert "mfd=10.4" in text and "1.55" in text and "extended" in text


def test_repr_point_mode():
    assert "point" in repr(_src(is_point_source=True))
