"""Gauss-Hermite rule tests (closed forms, symmetry, moment exactness)."""

import numpy as np
import pytest

from gqmap_tpu.ops.quadrature import build_table, gauss_hermite

SQRT_PI = np.sqrt(np.pi)


@pytest.mark.parametrize("K", [2, 3, 5, 9, 11, 17])
def test_weight_sum_and_symmetry(K):
    x, w = gauss_hermite(K)
    assert np.isclose(w.sum(), SQRT_PI, rtol=1e-13)
    assert np.allclose(x, -x[::-1], atol=1e-12)
    assert np.allclose(w, w[::-1], rtol=1e-10)
    assert np.all(np.diff(x) > 0)


def test_closed_form_k2():
    x, w = gauss_hermite(2)
    assert np.allclose(x, [-np.sqrt(0.5), np.sqrt(0.5)], atol=1e-14)
    assert np.allclose(w, [SQRT_PI / 2, SQRT_PI / 2], atol=1e-14)


def test_closed_form_k3():
    x, w = gauss_hermite(3)
    assert np.allclose(x, [-np.sqrt(1.5), 0.0, np.sqrt(1.5)], atol=1e-13)
    assert np.allclose(w, [SQRT_PI / 6, 2 * SQRT_PI / 3, SQRT_PI / 6], atol=1e-13)


@pytest.mark.parametrize("K", [5, 9])
def test_moment_exactness(K):
    # exact for polynomials up to degree 2K-1 under weight exp(-x^2)
    x, w = gauss_hermite(K)
    for p in range(0, 2 * K, 2):
        # int x^p exp(-x^2) = Gamma((p+1)/2)
        from scipy.special import gamma

        want = gamma((p + 1) / 2.0)
        assert np.isclose((w * x**p).sum(), want, rtol=1e-11), p
    # odd moments vanish
    assert abs((w * x**3).sum()) < 1e-12


def test_table_padding_inert():
    tab = build_table(5, chunk=4, dtype=np.float64)  # 25 -> 7 steps of 4 (pad 3)
    assert tab.steps == 7 and tab.chunk == 4
    assert tab.wiwj.reshape(-1)[25:].sum() == 0.0
    # sums over all points unaffected by padding
    assert np.isclose(tab.wiwj.sum(), np.pi, rtol=1e-12)  # (sum w)^2 = pi


def test_table_identities():
    tab = build_table(7, dtype=np.float64)
    # E over the product rule (weights wiwj, total mass pi)
    wi = tab.wiwj.reshape(-1)
    assert np.isclose((wi * tab.x2a.reshape(-1)).sum() / np.pi, 1.0, rtol=1e-12)
    assert abs((wi * tab.x2m.reshape(-1)).sum()) < 1e-12
    assert abs((wi * tab.xixj.reshape(-1)).sum()) < 1e-12
