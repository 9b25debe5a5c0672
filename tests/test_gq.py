"""GQ spectral-gradient core tests.

Three independent oracles:

1. a direct scalar transcription of the spectral quadrature recurrence
   (per-point accumulation exactly as specified in SURVEY.md §0.3 /
   ``gqmap_gpu_mixture.m:87-146``), validating the algebraic refactor used
   by the vectorized path;
2. closed-form moments of bivariate Gaussians for polynomial potentials
   (quadrature is exact there), validating the Stein identities against
   ``jax.grad`` of the closed form;
3. finite differences of the quadrature expectation itself.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gqmap_tpu.ops.gq import EDGE, NODE, finalize, gq_accumulate, gq_expectation
from gqmap_tpu.ops.quadrature import build_table, gauss_hermite

CONST1 = 1.0 + math.log(2 * math.pi)


def scalar_spectral(f, u1, u2, o1, o2, p, a, T, K, entropy_scale):
    """Literal per-point accumulation order (the reference kernel's loop)."""
    x, w = gauss_hermite(K)
    XI, XJ = np.meshgrid(x, x)
    WIWJ = np.outer(w, w).T.reshape(-1)
    XI, XJ = XI.reshape(-1), XJ.reshape(-1)
    sqrt2 = math.sqrt(2)
    s = (math.sqrt(1 + p) + math.sqrt(1 - p)) / 2
    t = (math.sqrt(1 + p) - math.sqrt(1 - p)) / 2
    pr = 1 - p * p
    sqrtpr = math.sqrt(pr)
    du1 = du2 = do1 = do2 = dp = Ei = 0.0
    for k in range(K * K):
        zi = s * XI[k] + t * XJ[k]
        zj = t * XI[k] + s * XJ[k]
        x1 = sqrt2 * o1 * zi + u1
        x2 = sqrt2 * o2 * zj + u2
        fval = WIWJ[k] * f(x1, x2)
        x2a = XI[k] ** 2 + XJ[k] ** 2
        x2m = XI[k] ** 2 - XJ[k] ** 2
        dp += fval * (p - p * x2a + 2 * XI[k] * XJ[k])
        du1 += fval * (zi - p * zj)
        du2 += fval * (zj - p * zi)
        do1 += fval * (x2a - 1 + x2m / sqrtpr)
        do2 += fval * (x2a - 1 - x2m / sqrtpr)
        Ei += fval
    cn = entropy_scale * T
    du1 = a * du1 * sqrt2 / (o1 * pr) / math.pi
    du2 = a * du2 * sqrt2 / (o2 * pr) / math.pi
    da = Ei / math.pi - cn * (CONST1 + math.log(sqrtpr * o1 * o2))
    do1 = a * (do1 / math.pi - cn) / o1
    do2 = a * (do2 / math.pi - cn) / o2
    dp = a * (dp / math.pi + cn * p) / pr
    return dict(da=da, du1=du1, du2=du2, do1=do1, do2=do2, dp=dp, E=a * da)


@pytest.mark.parametrize("p", [0.0, 0.37, -0.8, 0.999])
@pytest.mark.parametrize("entropy_scale,T", [(NODE, 0.0), (NODE, 0.2), (EDGE, 0.15)])
def test_vectorized_matches_scalar_spec(p, entropy_scale, T):
    K = 7
    u1, u2, o1, o2, a = 0.4, -1.1, 1.7, 0.6, 0.35
    lam, eps = 5.0, 1e-6
    f_np = lambda x1, x2: -lam * math.sqrt(eps + (x1 - x2) ** 2)
    f_j = lambda x1, x2: -lam * jnp.sqrt(eps + (x1 - x2) ** 2)
    want = scalar_spectral(f_np, u1, u2, o1, o2, p, a, T, K, entropy_scale)

    tab = build_table(K, chunk=10, dtype=np.float64)  # padded chunking
    arrs = [jnp.full((1,), v) for v in (u1, u2, o1, o2, p)]
    raw = gq_accumulate(f_j, *arrs, tab)
    got = finalize(raw, jnp.full((1,), a), arrs[2], arrs[3], arrs[4], T, entropy_scale)
    for k in ("da", "du1", "du2", "do1", "do2", "dp", "E"):
        np.testing.assert_allclose(
            float(getattr(got, k)[0]), want[k], rtol=1e-9, atol=1e-12, err_msg=k
        )


def test_polynomial_gradients_match_autodiff():
    # E[f] closed form for f = x1^2 + 3 x1 x2 + x2 + 2 x2^2
    def closedE(u1, u2, o1, o2, p):
        return (u1**2 + o1**2) + 3 * (u1 * u2 + p * o1 * o2) + u2 + 2 * (u2**2 + o2**2)

    f = lambda x1, x2: x1 * x1 + 3 * x1 * x2 + x2 + 2 * x2 * x2
    tab = build_table(5, dtype=np.float64)
    params = (0.3, -0.5, 1.2, 0.8, 0.4)
    grads = jax.grad(closedE, argnums=(0, 1, 2, 3, 4))(*params)
    arrs = [jnp.full((1,), v) for v in params]
    raw = gq_accumulate(f, *arrs, tab)
    fin = finalize(raw, jnp.ones(1), arrs[2], arrs[3], arrs[4], 0.0, NODE)
    got = (fin.du1, fin.du2, fin.do1, fin.do2, fin.dp)
    for g, w in zip(got, grads):
        np.testing.assert_allclose(float(g[0]), float(w), rtol=1e-10)
    np.testing.assert_allclose(float(fin.da[0]), closedE(*params), rtol=1e-12)


def test_gradients_match_finite_difference_of_expectation():
    # For non-polynomial f, the Stein-identity estimate equals the gradient
    # of the *true* expectation up to quadrature error; use high K and a
    # smooth Charbonnier to compare against central differences of the
    # quadrature expectation itself.
    lam, eps = 2.0, 0.5  # smooth epsilon keeps quadrature error tiny
    f = lambda x1, x2: -lam * jnp.sqrt(eps + (x1 - x2) ** 2)
    tab = build_table(31, dtype=np.float64)
    base = dict(u1=0.2, u2=-0.4, o1=0.9, o2=1.3, p=0.3)

    def E(**kw):
        arrs = [jnp.full((1,), kw[k]) for k in ("u1", "u2", "o1", "o2", "p")]
        return float(gq_expectation(f, *arrs, tab)[0])

    arrs = [jnp.full((1,), base[k]) for k in ("u1", "u2", "o1", "o2", "p")]
    raw = gq_accumulate(f, *arrs, tab)
    fin = finalize(raw, jnp.ones(1), arrs[2], arrs[3], arrs[4], 0.0, NODE)
    h = 1e-5
    for name, got in [("u1", fin.du1), ("u2", fin.du2), ("o1", fin.do1), ("o2", fin.do2), ("p", fin.dp)]:
        hi = dict(base); hi[name] += h
        lo = dict(base); lo[name] -= h
        fd = (E(**hi) - E(**lo)) / (2 * h)
        np.testing.assert_allclose(float(got[0]), fd, rtol=5e-5, atol=1e-7, err_msg=name)


def test_entropy_terms():
    # Zero potential isolates the temperature terms: E = -cn * a * H where
    # H = 1 + log(2 pi) + log(sqrt(1-p^2) o1 o2) (bivariate Gaussian entropy)
    T, a = 0.25, 0.6
    u1, u2, o1, o2, p = 0.0, 0.0, 1.5, 0.7, 0.4
    f = lambda x1, x2: jnp.zeros_like(x1)
    tab = build_table(3, dtype=np.float64)
    arrs = [jnp.full((1,), v) for v in (u1, u2, o1, o2, p)]
    raw = gq_accumulate(f, *arrs, tab)
    H = CONST1 + math.log(math.sqrt(1 - p * p) * o1 * o2)
    for scale, sign in [(NODE, -3.0), (EDGE, +1.0)]:
        fin = finalize(raw, jnp.full((1,), a), arrs[2], arrs[3], arrs[4], T, scale)
        np.testing.assert_allclose(float(fin.E[0]), sign * T * a * H, rtol=1e-12)
        # do1 must equal d(E)/d(o1) / ... consistency: d(-cn*a*H)/do1 = -cn*a/o1
        np.testing.assert_allclose(float(fin.do1[0]), sign * T * a / o1, rtol=1e-12)
        np.testing.assert_allclose(float(fin.dp[0]), sign * T * a * (-p / (1 - p * p)), rtol=1e-12)


def test_chunking_invariance():
    K = 9
    lam, eps = 5.0, 1e-6
    f = lambda x1, x2: -lam * jnp.sqrt(eps + (x1 - x2) ** 2)
    r = np.random.default_rng(0)
    shape = (4, 5)
    u1, u2 = r.normal(size=shape), r.normal(size=shape)
    o1, o2 = r.uniform(0.5, 2, shape), r.uniform(0.5, 2, shape)
    p = r.uniform(-0.9, 0.9, shape)
    outs = []
    for chunk in (0, 1, 7, 81):
        tab = build_table(K, chunk, np.float64)
        raw = gq_accumulate(f, *map(jnp.asarray, (u1, u2, o1, o2, p)), tab)
        outs.append(np.stack([np.asarray(x) for x in raw]))
    for o in outs[1:]:
        np.testing.assert_allclose(o, outs[0], rtol=1e-12, atol=1e-12)


def _rand_edge_sites(seed=0, shape=(4, 5)):
    r = np.random.default_rng(seed)
    return (
        r.normal(size=shape) * 3,
        r.normal(size=shape) * 3,
        r.uniform(0.3, 4, shape),
        r.uniform(0.3, 4, shape),
        r.uniform(-0.95, 0.95, shape),
    )


def test_reduced_edge_quadrature_polynomial_exact():
    # For polynomial difference potentials both rules are exact, so the
    # 1-D reduction must reproduce the K^2 tensor sums to fp precision.
    from gqmap_tpu.ops.gq import gq_accumulate_diff
    from gqmap_tpu.ops.quadrature import build_table_1d

    K = 7
    arrs = list(map(jnp.asarray, _rand_edge_sites()))
    for g in [lambda d: d * d, lambda d: 0.5 - d + 0.25 * d**3]:
        f = lambda x1, x2: g(x1 - x2)
        raw_t = gq_accumulate(f, *arrs, build_table(K, dtype=np.float64))
        raw_r = gq_accumulate_diff(g, *arrs, build_table_1d(K, dtype=np.float64))
        for a, b, name in zip(raw_t, raw_r, raw_t._fields):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-10, atol=1e-10, err_msg=name
            )


def test_reduced_edge_quadrature_charbonnier():
    # Non-polynomial g: the reduced K-point rule must match a high-order
    # tensor rule (the "truth") at least as well as the same-K tensor rule.
    from gqmap_tpu.ops.gq import gq_accumulate_diff
    from gqmap_tpu.ops.quadrature import build_table_1d

    lam, eps = 5.0, 1e-6
    g = lambda d: -lam * jnp.sqrt(eps + d * d)
    f = lambda x1, x2: g(x1 - x2)
    arrs = list(map(jnp.asarray, _rand_edge_sites(seed=3)))
    truth = np.stack([np.asarray(x) for x in gq_accumulate(f, *arrs, build_table(41, dtype=np.float64))])
    t9 = np.stack([np.asarray(x) for x in gq_accumulate(f, *arrs, build_table(9, dtype=np.float64))])
    # auto order 2K+3 = 21 (the config default for edge_quad="reduced"):
    # fewer than a third of the tensor rule's 81 evaluations, lower error.
    r21 = np.stack([np.asarray(x) for x in gq_accumulate_diff(g, *arrs, build_table_1d(21, dtype=np.float64))])
    err_t = np.max(np.abs(t9 - truth))
    err_r = np.max(np.abs(r21 - truth))
    assert err_r <= err_t, (err_r, err_t)
    scale = np.max(np.abs(truth))
    assert err_r <= 2e-2 * scale, (err_r, scale)


def test_reduced_edge_sweep_matches_tensor_sweep():
    # End-to-end: a single sweep with edge_quad="reduced" produces the same
    # updates as the tensor rule up to the (~1%) discretization difference
    # of the two equally-valid quadratures. Multi-sweep *state* comparison is
    # meaningless here: early gradients saturate the mu clamps, so any tiny
    # gradient difference flips pixels between the two bounds.
    from gqmap_tpu.config import FlowRange, GQMAPConfig
    from gqmap_tpu.models.gqmap import init_state, make_problem, make_sweep

    r = np.random.default_rng(0)
    I1 = r.uniform(0, 255, (24, 32))
    I2 = np.roll(I1, 1, axis=1)
    fr = FlowRange(-2.0, 2.0, -2.0, 2.0)
    outs = {}
    for eq in ("tensor", "reduced"):
        cfg = GQMAPConfig.full_mixture(dtype="float64", edge_quad=eq, its=40)
        problem = make_problem(cfg, I1, I2, fr)
        state = init_state(cfg, fr, I1.shape)
        sweep = jax.jit(make_sweep(cfg, I1.shape))
        new, aux = sweep(problem, state)
        outs[eq] = (np.asarray(new.muu) - np.asarray(state.muu), float(aux.energy))
    dmu_t, e_t = outs["tensor"]
    dmu_r, e_r = outs["reduced"]
    scale = np.abs(dmu_t).max()
    assert np.abs(dmu_r - dmu_t).max() <= 3e-2 * scale
    np.testing.assert_allclose(e_r, e_t, rtol=2e-2)
