"""Hard-coded first-order values of published sample systems,
generated from the reference by tools/gen_hardvals_paraxial_r5.py
(values asserted in-line, reference test style)."""

import numpy as np
import pytest

import optiland_tpu.samples as S


def _q(lens, name):
    return float(np.ravel(np.asarray(
        getattr(lens.paraxial, name)()))[0])


@pytest.fixture(scope='module')
def lenses():
    cache = {}

    def get(name):
        if name not in cache:
            cache[name] = getattr(S, name)()
        return cache[name]

    return get


def test_cooketriplet_f1(lenses):
    assert _q(lenses('CookeTriplet'), 'f1') == pytest.approx(
        -49.99978307143189, rel=1e-6, abs=1e-9)

def test_cooketriplet_f2(lenses):
    assert _q(lenses('CookeTriplet'), 'f2') == pytest.approx(
        49.999783071431914, rel=1e-6, abs=1e-9)

def test_cooketriplet_F1(lenses):
    assert _q(lenses('CookeTriplet'), 'F1') == pytest.approx(
        -37.345672974426165, rel=1e-6, abs=1e-9)

def test_cooketriplet_F2(lenses):
    assert _q(lenses('CookeTriplet'), 'F2') == pytest.approx(
        0.2070775589588157, rel=1e-6, abs=1e-9)

def test_cooketriplet_P1(lenses):
    assert _q(lenses('CookeTriplet'), 'P1') == pytest.approx(
        12.654110097005727, rel=1e-6, abs=1e-9)

def test_cooketriplet_P2(lenses):
    assert _q(lenses('CookeTriplet'), 'P2') == pytest.approx(
        -49.7927055124731, rel=1e-6, abs=1e-9)

def test_cooketriplet_N1(lenses):
    assert _q(lenses('CookeTriplet'), 'N1') == pytest.approx(
        12.654110097005749, rel=1e-6, abs=1e-9)

def test_cooketriplet_N2(lenses):
    assert _q(lenses('CookeTriplet'), 'N2') == pytest.approx(
        -49.79270551247308, rel=1e-6, abs=1e-9)

def test_cooketriplet_EPL(lenses):
    assert _q(lenses('CookeTriplet'), 'EPL') == pytest.approx(
        11.512158673746795, rel=1e-6, abs=1e-9)

def test_cooketriplet_EPD(lenses):
    assert _q(lenses('CookeTriplet'), 'EPD') == pytest.approx(
        10.0, rel=1e-6, abs=1e-9)

def test_cooketriplet_XPL(lenses):
    assert _q(lenses('CookeTriplet'), 'XPL') == pytest.approx(
        -50.961347703805274, rel=1e-6, abs=1e-9)

def test_cooketriplet_XPD(lenses):
    assert _q(lenses('CookeTriplet'), 'XPD') == pytest.approx(
        10.233729452318345, rel=1e-6, abs=1e-9)

def test_cooketriplet_FNO(lenses):
    assert _q(lenses('CookeTriplet'), 'FNO') == pytest.approx(
        4.999978307143191, rel=1e-6, abs=1e-9)

def test_cooketriplet_magnification(lenses):
    assert _q(lenses('CookeTriplet'), 'magnification') == pytest.approx(
        -0.0, rel=1e-6, abs=1e-9)

def test_cooketriplet_invariant(lenses):
    assert _q(lenses('CookeTriplet'), 'invariant') == pytest.approx(
        -1.8198511713310117, rel=1e-6, abs=1e-9)

def test_doublegauss_f1(lenses):
    assert _q(lenses('DoubleGauss'), 'f1') == pytest.approx(
        -100.00374787083722, rel=1e-6, abs=1e-9)

def test_doublegauss_f2(lenses):
    assert _q(lenses('DoubleGauss'), 'f2') == pytest.approx(
        100.00374787083724, rel=1e-6, abs=1e-9)

def test_doublegauss_F1(lenses):
    assert _q(lenses('DoubleGauss'), 'F1') == pytest.approx(
        -29.320758132673124, rel=1e-6, abs=1e-9)

def test_doublegauss_F2(lenses):
    assert _q(lenses('DoubleGauss'), 'F2') == pytest.approx(
        1.023919233828135e-05, rel=1e-6, abs=1e-9)

def test_doublegauss_P1(lenses):
    assert _q(lenses('DoubleGauss'), 'P1') == pytest.approx(
        70.6829897381641, rel=1e-6, abs=1e-9)

def test_doublegauss_P2(lenses):
    assert _q(lenses('DoubleGauss'), 'P2') == pytest.approx(
        -100.00373763164491, rel=1e-6, abs=1e-9)

def test_doublegauss_N1(lenses):
    assert _q(lenses('DoubleGauss'), 'N1') == pytest.approx(
        70.68298973816412, rel=1e-6, abs=1e-9)

def test_doublegauss_N2(lenses):
    assert _q(lenses('DoubleGauss'), 'N2') == pytest.approx(
        -100.00373763164488, rel=1e-6, abs=1e-9)

def test_doublegauss_EPL(lenses):
    assert _q(lenses('DoubleGauss'), 'EPL') == pytest.approx(
        57.911999997719626, rel=1e-6, abs=1e-9)

def test_doublegauss_EPD(lenses):
    assert _q(lenses('DoubleGauss'), 'EPD') == pytest.approx(
        20.00074957416745, rel=1e-6, abs=1e-9)

def test_doublegauss_XPL(lenses):
    assert _q(lenses('DoubleGauss'), 'XPL') == pytest.approx(
        -114.64441695254195, rel=1e-6, abs=1e-9)

def test_doublegauss_XPD(lenses):
    assert _q(lenses('DoubleGauss'), 'XPD') == pytest.approx(
        22.928885438346853, rel=1e-6, abs=1e-9)

def test_doublegauss_FNO(lenses):
    assert _q(lenses('DoubleGauss'), 'FNO') == pytest.approx(
        5.0, rel=1e-6, abs=1e-9)

def test_doublegauss_magnification(lenses):
    assert _q(lenses('DoubleGauss'), 'magnification') == pytest.approx(
        -0.0, rel=1e-6, abs=1e-9)

def test_doublegauss_invariant(lenses):
    assert _q(lenses('DoubleGauss'), 'invariant') == pytest.approx(
        -2.493373473346884, rel=1e-6, abs=1e-9)

def test_reversetelephoto_f1(lenses):
    assert _q(lenses('ReverseTelephoto'), 'f1') == pytest.approx(
        -2.0052402707991126, rel=1e-6, abs=1e-9)

def test_reversetelephoto_f2(lenses):
    assert _q(lenses('ReverseTelephoto'), 'f2') == pytest.approx(
        2.005240270799113, rel=1e-6, abs=1e-9)

def test_reversetelephoto_F1(lenses):
    assert _q(lenses('ReverseTelephoto'), 'F1') == pytest.approx(
        0.04272711870891329, rel=1e-6, abs=1e-9)

def test_reversetelephoto_F2(lenses):
    assert _q(lenses('ReverseTelephoto'), 'F2') == pytest.approx(
        0.02369843725048114, rel=1e-6, abs=1e-9)

def test_reversetelephoto_P1(lenses):
    assert _q(lenses('ReverseTelephoto'), 'P1') == pytest.approx(
        2.0479673895080257, rel=1e-6, abs=1e-9)

def test_reversetelephoto_P2(lenses):
    assert _q(lenses('ReverseTelephoto'), 'P2') == pytest.approx(
        -1.981541833548632, rel=1e-6, abs=1e-9)

def test_reversetelephoto_N1(lenses):
    assert _q(lenses('ReverseTelephoto'), 'N1') == pytest.approx(
        2.047967389508026, rel=1e-6, abs=1e-9)

def test_reversetelephoto_N2(lenses):
    assert _q(lenses('ReverseTelephoto'), 'N2') == pytest.approx(
        -1.9815418335486314, rel=1e-6, abs=1e-9)

def test_reversetelephoto_EPL(lenses):
    assert _q(lenses('ReverseTelephoto'), 'EPL') == pytest.approx(
        1.3489734720774775, rel=1e-6, abs=1e-9)

def test_reversetelephoto_EPD(lenses):
    assert _q(lenses('ReverseTelephoto'), 'EPD') == pytest.approx(
        0.3, rel=1e-6, abs=1e-9)

def test_reversetelephoto_XPL(lenses):
    assert _q(lenses('ReverseTelephoto'), 'XPL') == pytest.approx(
        -3.0545788978518327, rel=1e-6, abs=1e-9)

def test_reversetelephoto_XPD(lenses):
    assert _q(lenses('ReverseTelephoto'), 'XPD') == pytest.approx(
        0.46053493637581633, rel=1e-6, abs=1e-9)

def test_reversetelephoto_FNO(lenses):
    assert _q(lenses('ReverseTelephoto'), 'FNO') == pytest.approx(
        6.6841342359970435, rel=1e-6, abs=1e-9)

def test_reversetelephoto_magnification(lenses):
    assert _q(lenses('ReverseTelephoto'), 'magnification') == pytest.approx(
        -0.0, rel=1e-6, abs=1e-9)

def test_reversetelephoto_invariant(lenses):
    assert _q(lenses('ReverseTelephoto'), 'invariant') == pytest.approx(
        -0.08660254037844384, rel=1e-6, abs=1e-9)

def test_tessarlens_f1(lenses):
    assert _q(lenses('TessarLens'), 'f1') == pytest.approx(
        -3.9977777470211944, rel=1e-6, abs=1e-9)

def test_tessarlens_f2(lenses):
    assert _q(lenses('TessarLens'), 'f2') == pytest.approx(
        3.9977777470211935, rel=1e-6, abs=1e-9)

def test_tessarlens_F1(lenses):
    assert _q(lenses('TessarLens'), 'F1') == pytest.approx(
        -3.4047630367687565, rel=1e-6, abs=1e-9)

def test_tessarlens_F2(lenses):
    assert _q(lenses('TessarLens'), 'F2') == pytest.approx(
        0.016255381553407968, rel=1e-6, abs=1e-9)

def test_tessarlens_P1(lenses):
    assert _q(lenses('TessarLens'), 'P1') == pytest.approx(
        0.5930147102524379, rel=1e-6, abs=1e-9)

def test_tessarlens_P2(lenses):
    assert _q(lenses('TessarLens'), 'P2') == pytest.approx(
        -3.9815223654677854, rel=1e-6, abs=1e-9)

def test_tessarlens_N1(lenses):
    assert _q(lenses('TessarLens'), 'N1') == pytest.approx(
        0.593014710252437, rel=1e-6, abs=1e-9)

def test_tessarlens_N2(lenses):
    assert _q(lenses('TessarLens'), 'N2') == pytest.approx(
        -3.9815223654677863, rel=1e-6, abs=1e-9)

def test_tessarlens_EPL(lenses):
    assert _q(lenses('TessarLens'), 'EPL') == pytest.approx(
        0.6587555774251294, rel=1e-6, abs=1e-9)

def test_tessarlens_EPD(lenses):
    assert _q(lenses('TessarLens'), 'EPD') == pytest.approx(
        0.8883950548935986, rel=1e-6, abs=1e-9)

def test_tessarlens_XPL(lenses):
    assert _q(lenses('TessarLens'), 'XPL') == pytest.approx(
        -3.9168450744779424, rel=1e-6, abs=1e-9)

def test_tessarlens_XPD(lenses):
    assert _q(lenses('TessarLens'), 'XPD') == pytest.approx(
        0.8740223235625226, rel=1e-6, abs=1e-9)

def test_tessarlens_FNO(lenses):
    assert _q(lenses('TessarLens'), 'FNO') == pytest.approx(
        4.5, rel=1e-6, abs=1e-9)

def test_tessarlens_magnification(lenses):
    assert _q(lenses('TessarLens'), 'magnification') == pytest.approx(
        -0.0, rel=1e-6, abs=1e-9)

def test_tessarlens_invariant(lenses):
    assert _q(lenses('TessarLens'), 'invariant') == pytest.approx(
        -0.16607865017738932, rel=1e-6, abs=1e-9)

def test_hubbletelescope_f1(lenses):
    assert _q(lenses('HubbleTelescope'), 'f1') == pytest.approx(
        -57600.08099840297, rel=1e-6, abs=1e-9)

def test_hubbletelescope_f2(lenses):
    assert _q(lenses('HubbleTelescope'), 'f2') == pytest.approx(
        57600.080998403595, rel=1e-6, abs=1e-9)

def test_hubbletelescope_F1(lenses):
    assert _q(lenses('HubbleTelescope'), 'F1') == pytest.approx(
        -471891.9369498712, rel=1e-6, abs=1e-9)

def test_hubbletelescope_F2(lenses):
    assert _q(lenses('HubbleTelescope'), 'F2') == pytest.approx(
        0.016864237529848742, rel=1e-6, abs=1e-9)

def test_hubbletelescope_P1(lenses):
    assert _q(lenses('HubbleTelescope'), 'P1') == pytest.approx(
        -414291.8559514682, rel=1e-6, abs=1e-9)

def test_hubbletelescope_P2(lenses):
    assert _q(lenses('HubbleTelescope'), 'P2') == pytest.approx(
        -57600.06413416607, rel=1e-6, abs=1e-9)

def test_hubbletelescope_N1(lenses):
    assert _q(lenses('HubbleTelescope'), 'N1') == pytest.approx(
        -414291.8559514676, rel=1e-6, abs=1e-9)

def test_hubbletelescope_N2(lenses):
    assert _q(lenses('HubbleTelescope'), 'N2') == pytest.approx(
        -57600.06413416544, rel=1e-6, abs=1e-9)

def test_hubbletelescope_EPL(lenses):
    assert _q(lenses('HubbleTelescope'), 'EPL') == pytest.approx(
        4910.01016, rel=1e-6, abs=1e-9)

def test_hubbletelescope_EPD(lenses):
    assert _q(lenses('HubbleTelescope'), 'EPD') == pytest.approx(
        2400.0, rel=1e-6, abs=1e-9)

def test_hubbletelescope_XPL(lenses):
    assert _q(lenses('HubbleTelescope'), 'XPL') == pytest.approx(
        -6958.363551642134, rel=1e-6, abs=1e-9)

def test_hubbletelescope_XPD(lenses):
    assert _q(lenses('HubbleTelescope'), 'XPD') == pytest.approx(
        289.93210961932573, rel=1e-6, abs=1e-9)

def test_hubbletelescope_FNO(lenses):
    assert _q(lenses('HubbleTelescope'), 'FNO') == pytest.approx(
        24.000033749334833, rel=1e-6, abs=1e-9)

def test_hubbletelescope_magnification(lenses):
    assert _q(lenses('HubbleTelescope'), 'magnification') == pytest.approx(
        -0.0, rel=1e-6, abs=1e-9)

def test_hubbletelescope_invariant(lenses):
    assert _q(lenses('HubbleTelescope'), 'invariant') == pytest.approx(
        -3.1415998309883313, rel=1e-6, abs=1e-9)

def test_asphericsinglet_f1(lenses):
    assert _q(lenses('AsphericSinglet'), 'f1') == pytest.approx(
        -25.484006006625144, rel=1e-6, abs=1e-9)

def test_asphericsinglet_f2(lenses):
    assert _q(lenses('AsphericSinglet'), 'f2') == pytest.approx(
        25.484006006625144, rel=1e-6, abs=1e-9)

def test_asphericsinglet_F1(lenses):
    assert _q(lenses('AsphericSinglet'), 'F1') == pytest.approx(
        -25.484006006625144, rel=1e-6, abs=1e-9)

def test_asphericsinglet_F2(lenses):
    assert _q(lenses('AsphericSinglet'), 'F2') == pytest.approx(
        2.6100511064854625e-09, rel=1e-6, abs=1e-9)

def test_asphericsinglet_P1(lenses):
    assert _q(lenses('AsphericSinglet'), 'P1') == pytest.approx(
        0.0, rel=1e-6, abs=1e-9)

def test_asphericsinglet_P2(lenses):
    assert _q(lenses('AsphericSinglet'), 'P2') == pytest.approx(
        -25.484006004015093, rel=1e-6, abs=1e-9)

def test_asphericsinglet_N1(lenses):
    assert _q(lenses('AsphericSinglet'), 'N1') == pytest.approx(
        0.0, rel=1e-6, abs=1e-9)

def test_asphericsinglet_N2(lenses):
    assert _q(lenses('AsphericSinglet'), 'N2') == pytest.approx(
        -25.484006004015093, rel=1e-6, abs=1e-9)

def test_asphericsinglet_EPL(lenses):
    assert _q(lenses('AsphericSinglet'), 'EPL') == pytest.approx(
        0.0, rel=1e-6, abs=1e-9)

def test_asphericsinglet_EPD(lenses):
    assert _q(lenses('AsphericSinglet'), 'EPD') == pytest.approx(
        20.0, rel=1e-6, abs=1e-9)

def test_asphericsinglet_XPL(lenses):
    assert _q(lenses('AsphericSinglet'), 'XPL') == pytest.approx(
        -25.48400600401509, rel=1e-6, abs=1e-9)

def test_asphericsinglet_XPD(lenses):
    assert _q(lenses('AsphericSinglet'), 'XPD') == pytest.approx(
        20.0, rel=1e-6, abs=1e-9)

def test_asphericsinglet_FNO(lenses):
    assert _q(lenses('AsphericSinglet'), 'FNO') == pytest.approx(
        1.2742003003312572, rel=1e-6, abs=1e-9)

def test_asphericsinglet_magnification(lenses):
    assert _q(lenses('AsphericSinglet'), 'magnification') == pytest.approx(
        -0.0, rel=1e-6, abs=1e-9)

def test_asphericsinglet_invariant(lenses):
    assert _q(lenses('AsphericSinglet'), 'invariant') == pytest.approx(
        -0.0, rel=1e-6, abs=1e-9)
