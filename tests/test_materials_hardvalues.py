"""Hard-coded catalog dispersion values (n at F/d/C lines),
generated from the reference by tools/gen_hardvals_paraxial_r5.py
(the 40 MB refractiveindex.info snapshot is the shared source)."""

import numpy as np
import pytest

from optiland_tpu.materials import Material


def test_n_bk7_index_lines():
    m = Material('N-BK7')
    assert float(np.ravel(np.asarray(m.n(0.4861)))[0]) == \
        pytest.approx(1.522378655770899, rel=1e-9)
    assert float(np.ravel(np.asarray(m.n(0.5876)))[0]) == \
        pytest.approx(1.5167984379050088, rel=1e-9)
    assert float(np.ravel(np.asarray(m.n(0.6563)))[0]) == \
        pytest.approx(1.5143214899520485, rel=1e-9)

def test_n_sf11_index_lines():
    m = Material('N-SF11')
    assert float(np.ravel(np.asarray(m.n(0.4861)))[0]) == \
        pytest.approx(1.8065225839029835, rel=1e-9)
    assert float(np.ravel(np.asarray(m.n(0.5876)))[0]) == \
        pytest.approx(1.7847141030246312, rel=1e-9)
    assert float(np.ravel(np.asarray(m.n(0.6563)))[0]) == \
        pytest.approx(1.7759521866247308, rel=1e-9)

def test_sf11_index_lines():
    m = Material('SF11')
    assert float(np.ravel(np.asarray(m.n(0.4861)))[0]) == \
        pytest.approx(1.8065225839029835, rel=1e-9)
    assert float(np.ravel(np.asarray(m.n(0.5876)))[0]) == \
        pytest.approx(1.7847141030246312, rel=1e-9)
    assert float(np.ravel(np.asarray(m.n(0.6563)))[0]) == \
        pytest.approx(1.7759521866247308, rel=1e-9)

def test_n_sk16_index_lines():
    m = Material('N-SK16')
    assert float(np.ravel(np.asarray(m.n(0.4861)))[0]) == \
        pytest.approx(1.6275593970871105, rel=1e-9)
    assert float(np.ravel(np.asarray(m.n(0.5876)))[0]) == \
        pytest.approx(1.6204079330698105, rel=1e-9)
    assert float(np.ravel(np.asarray(m.n(0.6563)))[0]) == \
        pytest.approx(1.6172705801002663, rel=1e-9)

def test_n_lak34_index_lines():
    m = Material('N-LAK34')
    assert float(np.ravel(np.asarray(m.n(0.4861)))[0]) == \
        pytest.approx(1.7384729171972209, rel=1e-9)
    assert float(np.ravel(np.asarray(m.n(0.5876)))[0]) == \
        pytest.approx(1.7291574207787639, rel=1e-9)
    assert float(np.ravel(np.asarray(m.n(0.6563)))[0]) == \
        pytest.approx(1.7250882664050815, rel=1e-9)

def test_n_sf5_index_lines():
    m = Material('N-SF5')
    assert float(np.ravel(np.asarray(m.n(0.4861)))[0]) == \
        pytest.approx(1.6875028087957493, rel=1e-9)
    assert float(np.ravel(np.asarray(m.n(0.5876)))[0]) == \
        pytest.approx(1.6727030184452947, rel=1e-9)
    assert float(np.ravel(np.asarray(m.n(0.6563)))[0]) == \
        pytest.approx(1.6666358202552622, rel=1e-9)

def test_lithotec_caf2_index_lines():
    m = Material('LITHOTEC-CAF2')
    assert float(np.ravel(np.asarray(m.n(0.4861)))[0]) == \
        pytest.approx(1.4370169192312512, rel=1e-9)
    assert float(np.ravel(np.asarray(m.n(0.5876)))[0]) == \
        pytest.approx(1.4338467169521416, rel=1e-9)
    assert float(np.ravel(np.asarray(m.n(0.6563)))[0]) == \
        pytest.approx(1.4324594464262932, rel=1e-9)

def test_n_baf10_index_lines():
    m = Material('N-BAF10')
    assert float(np.ravel(np.asarray(m.n(0.4861)))[0]) == \
        pytest.approx(1.6800046975070044, rel=1e-9)
    assert float(np.ravel(np.asarray(m.n(0.5876)))[0]) == \
        pytest.approx(1.6700270465473999, rel=1e-9)
    assert float(np.ravel(np.asarray(m.n(0.6563)))[0]) == \
        pytest.approx(1.6657768964330308, rel=1e-9)

def test_n_ssk2_index_lines():
    m = Material('N-SSK2')
    assert float(np.ravel(np.asarray(m.n(0.4861)))[0]) == \
        pytest.approx(1.630455191469802, rel=1e-9)
    assert float(np.ravel(np.asarray(m.n(0.5876)))[0]) == \
        pytest.approx(1.6222915007887073, rel=1e-9)
    assert float(np.ravel(np.asarray(m.n(0.6563)))[0]) == \
        pytest.approx(1.6187694030208482, rel=1e-9)

def test_n_lasf44_index_lines():
    m = Material('N-LASF44')
    assert float(np.ravel(np.asarray(m.n(0.4861)))[0]) == \
        pytest.approx(1.8163078717916998, rel=1e-9)
    assert float(np.ravel(np.asarray(m.n(0.5876)))[0]) == \
        pytest.approx(1.8041965061599254, rel=1e-9)
    assert float(np.ravel(np.asarray(m.n(0.6563)))[0]) == \
        pytest.approx(1.7990064871767248, rel=1e-9)
