"""Closed-form cosine data term: characteristic-function algebra oracles.

1. The hand-derived per-mode gradient sums must equal ``jax.grad`` of the
   closed-form expectation (same truncated surface, machine precision).
2. The closed-form expectation must match brute-force high-order
   Gauss-Hermite quadrature of the SAME truncated cosine surface (the
   surface is entire, so quadrature converges fast) — this validates the
   characteristic-function algebra including the correlation coupling.
3. End-to-end: the cosine-term solver optimizes (AEPE improves) and tracks
   the chebyshev-term solver on a synthetic pair.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gqmap_tpu.ops.cosine import CosData, cos_ei, cos_node_grads
from gqmap_tpu.ops.gq import NODE, gq_expectation
from gqmap_tpu.ops.quadrature import build_table


def _toy_cosdata(A=6, B=5, M=3, N=4, seed=0, box=(-2.0, 3.0, -1.5, 1.0)):
    r = np.random.default_rng(seed)
    coeffs = jnp.asarray(r.normal(size=(A, B, M, N)) / (1.0 + np.arange(A)[:, None, None, None]))
    lo_u, hi_u, lo_v, hi_v = box
    return CosData(
        coeffs=coeffs,
        lo_u=jnp.asarray(lo_u), hi_u=jnp.asarray(hi_u),
        lo_v=jnp.asarray(lo_v), hi_v=jnp.asarray(hi_v),
    )


def _surface_fn(cos: CosData):
    """Pointwise evaluation of the truncated cosine surface (for quadrature)."""
    A, B = cos.coeffs.shape[:2]

    def f(x1, x2):
        ku = jnp.pi / (cos.hi_u - cos.lo_u)
        kv = jnp.pi / (cos.hi_v - cos.lo_v)
        th1 = ku * (x1 - cos.lo_u)
        th2 = kv * (x2 - cos.lo_v)
        out = 0.0
        for a in range(A):
            for b in range(B):
                out = out + cos.coeffs[a, b] * jnp.cos(a * th1) * jnp.cos(b * th2)
        return out

    return f


def _rand_sites(M=3, N=4, L=2, seed=1, sig_hi=2.5):
    r = np.random.default_rng(seed)
    return (
        jnp.asarray(r.uniform(-1.5, 2.5, (L, M, N))),
        jnp.asarray(r.uniform(-1.2, 0.7, (L, M, N))),
        jnp.asarray(r.uniform(0.05, sig_hi, (L, M, N))),
        jnp.asarray(r.uniform(0.05, sig_hi, (L, M, N))),
        jnp.asarray(r.uniform(-0.9, 0.9, (L, M, N))),
    )


def test_cos_ei_matches_quadrature_of_surface():
    # NOTE the oracle direction: the closed form is EXACT for the truncated
    # cosine surface; Gauss-Hermite only converges once K resolves the
    # oscillation frequency (max omega*sigma*sqrt(2) here ~2.7 -> K=41 ample;
    # at sigma 2.5 / degree 5 even K=31 is off by O(1) — which is precisely
    # the quadrature error this data term eliminates).
    cos = _toy_cosdata(A=4, B=3)
    u1, u2, o1, o2, p = _rand_sites(sig_hi=1.0)
    got = np.asarray(cos_ei(cos, u1, u2, o1, o2, p))
    want = np.asarray(
        gq_expectation(_surface_fn(cos), u1, u2, o1, o2, p, build_table(41, dtype=np.float64))
    )
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_cos_grads_match_autodiff_of_closed_form():
    cos = _toy_cosdata(seed=2)
    u1, u2, o1, o2, p = _rand_sites(seed=3)
    a = jnp.asarray(0.7)
    T = 0.0
    g = cos_node_grads(cos, u1, u2, o1, o2, p, a, T, NODE)

    def E(u1_, u2_, o1_, o2_, p_):
        return jnp.sum(cos_ei(cos, u1_, u2_, o1_, o2_, p_))

    grads = jax.grad(E, argnums=(0, 1, 2, 3, 4))(u1, u2, o1, o2, p)
    for got, want, name in zip(
        (g.du1, g.du2, g.do1, g.do2, g.dp), grads, ("du1", "du2", "do1", "do2", "dp")
    ):
        np.testing.assert_allclose(
            np.asarray(got), 0.7 * np.asarray(want), rtol=1e-9, atol=1e-11, err_msg=name
        )
    np.testing.assert_allclose(
        np.asarray(g.da), np.asarray(cos_ei(cos, u1, u2, o1, o2, p)), rtol=1e-12
    )


def test_cos_grads_entropy_terms():
    # T != 0 adds the Bethe node-entropy corrections exactly like finalize.
    import math

    cos = _toy_cosdata(seed=4)
    u1, u2, o1, o2, p = _rand_sites(seed=5)
    a, T = jnp.asarray(0.5), 0.3
    g0 = cos_node_grads(cos, u1, u2, o1, o2, p, a, 0.0, NODE)
    gT = cos_node_grads(cos, u1, u2, o1, o2, p, a, T, NODE)
    cn = NODE * T
    np.testing.assert_allclose(
        np.asarray(gT.do1), np.asarray(g0.do1) - 0.5 * cn / np.asarray(o1), rtol=1e-9
    )
    H = (1.0 + math.log(2 * math.pi)) + np.log(np.sqrt(1 - np.asarray(p) ** 2) * np.asarray(o1) * np.asarray(o2))
    np.testing.assert_allclose(np.asarray(gT.da), np.asarray(g0.da) - cn * H, rtol=1e-9)


def test_cosine_solver_improves_and_tracks_chebyshev():
    from gqmap_tpu.config import FlowRange, GQMAPConfig
    from gqmap_tpu.models.gqmap import aepe_of, make_map_fn, make_problem, init_state, make_segment_runner

    r = np.random.default_rng(0)
    I1 = r.uniform(0, 255, (28, 36))
    k = np.ones(5) / 5
    I1 = np.apply_along_axis(lambda x: np.convolve(x, k, "same"), 0, I1)
    I1 = np.apply_along_axis(lambda x: np.convolve(x, k, "same"), 1, I1)
    I2 = np.roll(I1, 1, axis=1)
    gt = np.zeros((28, 36, 2))
    gt[..., 0] = 1.0
    fr = FlowRange(-2.0, 2.0, -2.0, 2.0)
    unknown = np.zeros((28, 36), bool)

    aepes = {}
    for dt in ("cosine", "chebyshev"):
        cfg = GQMAPConfig.full_mixture(
            dtype="float64", data_term=dt, cheb_p=24, cheb_q=24, its=600,
            eval_every=600, edge_quad="reduced",
        )
        problem = make_problem(cfg, I1, I2, fr)
        state = init_state(cfg, fr, I1.shape)
        seg = make_segment_runner(cfg, I1.shape)
        state, n, *_ = seg(problem, state, 600)
        flow = np.asarray(make_map_fn(cfg)(state))
        aepes[dt] = aepe_of(cfg, flow, gt, unknown)
    # both must clearly beat the random-init AEPE (~1.5 over a +-2 box)
    assert aepes["cosine"] < 0.7, aepes
    assert abs(aepes["cosine"] - aepes["chebyshev"]) < 0.25, aepes
