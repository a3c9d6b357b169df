"""Native C++ table builder vs the pure-Python engine, bit-for-bit."""

import numpy as np
import pytest

from libiqo_tpu.coeffs import engine, native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")

CASES = [(2, 1), (3, 1), (3, 2), (4, 1), (9, 1)]
GEOMS = [(2, 1), (16, 9), (97, 31), (31, 97), (480, 270), (1079, 773)]


@pytest.mark.parametrize("r_src,r_dst", GEOMS)
@pytest.mark.parametrize("degree,px", CASES)
def test_lanczos_tables_match(r_src, r_dst, degree, px):
    n = engine.calc_num_coefs_lanczos(degree, r_src, r_dst, px)
    got = native.lanczos_tables(degree, r_src, r_dst, px, n, 1 << 14)
    want = np.stack([
        engine.adjust_coefs(*engine.set_lanczos_table(degree, r_src, r_dst, d, px, n),
                            1 << 14)
        for d in range(r_dst)])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("r_src,r_dst", [(4, 1), (5, 3), (97, 31), (1080, 270)])
def test_area_tables_match(r_src, r_dst):
    n = engine.calc_num_coefs_area(r_src, r_dst)
    got = native.area_tables(r_src, r_dst, n, 1 << 15)
    want = np.stack([
        engine.adjust_coefs(*engine.set_area_table(r_src, r_dst, d, n),
                            1 << 15, signed=False)
        for d in range(r_dst)])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("r_src,r_dst", [(2, 1), (4, 5), (97, 31), (61, 23), (2, 11)])
def test_linear_tables_match(r_src, r_dst):
    got = native.linear_tables(r_src, r_dst, 1 << 15)
    want = engine.adjust_coefs_linear(engine.set_linear_table(r_src, r_dst), 1 << 15)
    np.testing.assert_array_equal(got, want)


def test_native_is_active_in_plans():
    assert native.available()
