"""Legacy-lineage capabilities: windowed data cost (cpuV2/V3), the Prewitt
chain-rule estimator (gpuV3), reset_para, and the block-matching init driver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import gaussian_filter

from gqmap_tpu import FlowRange, GQMAPConfig
from gqmap_tpu.models.gqmap import init_state, make_problem, make_sweep, solve

from conftest import needs_data


def shifted_pair(M, N, dx=1, seed=0, smooth=2.0):
    r = np.random.default_rng(seed)
    I1 = gaussian_filter(r.uniform(0, 255, (M, N)), smooth)
    I2 = np.roll(I1, dx, axis=1)
    gt = np.zeros((M, N, 2))
    gt[..., 0] = dx
    return I1, I2, gt


# ---------------------------------------------------------------- window term

def test_windowed_term_equals_mean_of_shifted_plain_terms():
    # legacy/gqmap_cpuV2.m:29-33 semantics: windowed npot at (i, j) is the
    # MEAN over the (2rg+1)^2 window of plain per-pixel costs, the candidate
    # displacement shared across the window
    from gqmap_tpu.models.gqmap import _node_f

    I1, I2, _ = shifted_pair(12, 14)
    fr = FlowRange(-2, 2, -2, 2)
    rg = 1
    cfg_w = GQMAPConfig.legacy_v2(
        K=3, dtype="float64", window_rg=rg, data_term="bicubic", epsn=1e-6,
    )
    cfg_p = GQMAPConfig.single_gaussian(K=3, dtype="float64", epsn=1e-6)
    pw = make_problem(cfg_w, I1, I2, fr)
    pp = make_problem(cfg_p, I1, I2, fr)
    fw = _node_f(cfg_w, pw)
    fp = _node_f(cfg_p, pp)

    r = np.random.default_rng(1)
    x1 = jnp.asarray(r.uniform(-2, 2, (12, 14)))
    x2 = jnp.asarray(r.uniform(-2, 2, (12, 14)))
    vw = np.asarray(fw(x1, x2))
    vp = np.asarray(fp(x1, x2))

    # manual window mean at an interior site: the plain term evaluated at
    # each window pixel with the CENTER's displacement
    i, j = 5, 6
    acc = 0.0
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            vshift = np.asarray(fp(
                jnp.full((12, 14), float(x1[i, j])),
                jnp.full((12, 14), float(x2[i, j])),
            ))
            acc += vshift[i + di, j + dj]
    np.testing.assert_allclose(vw[i, j], acc / 9.0, rtol=1e-12)
    # and the rg=0 limit degenerates to the plain term
    cfg0 = GQMAPConfig.legacy_v2(
        K=3, dtype="float64", window_rg=0, data_term="bicubic", border=1, epsn=1e-6,
    )
    assert np.allclose(
        np.asarray(_node_f(cfg0, make_problem(cfg0, I1, I2, fr))(x1, x2)), vp
    )


@pytest.mark.parametrize("spectral", ["cosine", "chebyshev"])
def test_windowed_spectral_matches_direct(spectral):
    # the window composes with the spectral builds: box-filtered surface
    # before the DCT == direct windowed term, to truncation error
    from gqmap_tpu.models.gqmap import _node_f
    from gqmap_tpu.ops.cosine import cos_ei

    I1, I2, _ = shifted_pair(16, 20)
    fr = FlowRange(-2, 2, -2, 2)
    cfg_d = GQMAPConfig.legacy_v2(K=3, dtype="float64", window_rg=2, data_term="bicubic")
    cfg_s = GQMAPConfig.legacy_v2(
        K=3, dtype="float64", window_rg=2, data_term=spectral,
        cheb_p=48, cheb_q=48, cheb_margin=1.0,
    )
    pd = make_problem(cfg_d, I1, I2, fr)
    ps = make_problem(cfg_s, I1, I2, fr)
    r = np.random.default_rng(0)
    x1 = jnp.asarray(r.uniform(-2, 2, (16, 20)))
    x2 = jnp.asarray(r.uniform(-2, 2, (16, 20)))
    vd = np.asarray(_node_f(cfg_d, pd)(x1, x2))
    if spectral == "chebyshev":
        vs = np.asarray(_node_f(cfg_s, ps)(x1, x2))
    else:
        # cosine has no point evaluator; compare the zero-sigma expectation
        tiny = jnp.full_like(x1, 1e-4)
        vs = np.asarray(cos_ei(ps.cheb, x1, x2, tiny, tiny, jnp.zeros_like(x1)))
    assert np.abs(vs - vd).mean() / np.abs(vd).max() < 0.01


def test_legacy_v2_preset_runs_and_improves():
    I1, I2, gt = shifted_pair(20, 24)
    cfg = GQMAPConfig.legacy_v2(
        K=5, its=300, eval_every=100, dtype="float64", window_rg=1,
    )
    res = solve(cfg, I1, I2, gt_flow=gt, flow_range=FlowRange(-2, 2, -2, 2), seed=1)
    assert np.isfinite(res.Energy[: res.iters]).all()
    assert res.best_aepe < res.AEPE[99]


# ---------------------------------------------------------- prewitt estimator

def test_prewitt_gradients_exact_on_linear_ramp():
    from gqmap_tpu.ops.interp import prewitt_gradients

    yy, xx = np.mgrid[0:12, 0:15].astype(float)
    V = 3.0 * xx - 2.0 * yy + 7.0
    Gx, Gy = prewitt_gradients(jnp.asarray(V))
    np.testing.assert_allclose(np.asarray(Gx)[1:-1, 1:-1], 3.0, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(Gy)[1:-1, 1:-1], -2.0, rtol=1e-12)


def test_prewitt_estimator_matches_stein_on_smooth_ramp():
    # On a linear-ramp frame pair the Charbonnier integrand is smooth and
    # the Prewitt gradients exact, so the chain-rule estimator must agree
    # with the Stein identities (both estimate dE/dtheta of the same
    # nearest-lookup expectation; the lookup quantization is 2^-rfc)
    from gqmap_tpu.ops.gq import NODE, finalize, finalize_chain, gq_accumulate, gq_accumulate_chain
    from gqmap_tpu.ops.potentials import make_node_pot_nearest, make_node_pot_nearest_chain
    from gqmap_tpu.ops.quadrature import build_table

    # sized so quadrature sample positions stay far from the image boundary
    # (the chain rule reads the gradient at the CLAMPED position — nonzero —
    # while the true lookup derivative vanishes beyond the clamp; the
    # reference has the same boundary semantics, legacy/gqmap_gpuV3.m:100-102);
    # epsn large enough that the Charbonnier kink is quadrature-resolvable
    M, N = 24, 28
    yy, xx = np.mgrid[0:M, 0:N].astype(float)
    I2 = 2.0 * xx + 1.0 * yy
    I1 = I2 + 1.7  # constant offset: diff is nonzero, gradient fields constant
    fr = FlowRange(-1.5, 1.5, -1.5, 1.5)
    cfg = GQMAPConfig.legacy_v3(K=9, dtype="float64", rfc=6, epsn=0.25)
    problem = make_problem(cfg, I1, I2, fr)

    r = np.random.default_rng(2)
    u1 = jnp.asarray(r.uniform(-0.5, 0.5, (M, N)))
    u2 = jnp.asarray(r.uniform(-0.5, 0.5, (M, N)))
    o1 = jnp.asarray(r.uniform(0.2, 0.4, (M, N)))
    o2 = jnp.asarray(r.uniform(0.2, 0.4, (M, N)))
    p = jnp.asarray(r.uniform(-0.5, 0.5, (M, N)))
    a = jnp.ones(())
    tab = build_table(cfg.K, 0, jnp.float64)

    f = make_node_pot_nearest(problem.I1, problem.I2_tab, cfg.lambdad, cfg.epsn, cfg.rfc)
    fg = make_node_pot_nearest_chain(
        problem.I1, problem.I2_tab, problem.grad_tabs[0], problem.grad_tabs[1],
        cfg.lambdad, cfg.epsn, cfg.rfc,
    )
    gs = finalize(gq_accumulate(f, u1, u2, o1, o2, p, tab), a, o1, o2, p, 0.0, NODE)
    gc = finalize_chain(gq_accumulate_chain(fg, u1, u2, o1, o2, p, tab), a, o1, o2, p, 0.0, NODE)

    # E is identical (same potential evaluations); the gradients agree to the
    # nearest-lookup quantization noise (measured 1.5-6% at rfc=6) — the
    # tolerance is set to catch sign/scale bugs (sqrt2 / pi / transform-
    # derivative errors are >= 40%), not to hide the families' genuine
    # quadrature-noise difference (the POINT of the gpuV3 lineage)
    inner = np.s_[6:-6, 6:-6]
    np.testing.assert_allclose(
        np.asarray(gc.E)[inner], np.asarray(gs.E)[inner], rtol=1e-12
    )
    for name in ("du1", "du2", "do1", "do2", "dp"):
        s = np.asarray(getattr(gs, name))[inner]
        c = np.asarray(getattr(gc, name))[inner]
        scale = max(np.abs(s).max(), 1e-9)
        assert np.abs(s - c).max() / scale < 0.10, (name, np.abs(s - c).max(), scale)


def test_legacy_v3_preset_runs_and_improves():
    I1, I2, gt = shifted_pair(20, 24)
    cfg = GQMAPConfig.legacy_v3(K=5, its=300, eval_every=100, dtype="float64", tor=1e-6)
    res = solve(cfg, I1, I2, gt_flow=gt, flow_range=FlowRange(-2, 2, -2, 2), seed=1)
    assert np.isfinite(res.Energy[: res.iters]).all()
    assert res.best_aepe < res.AEPE[99]


# ------------------------------------------------------- reset_para + init_flow

def test_reset_para_hook():
    # with a zero step nothing moves, so after reset_at the final sigma is
    # exactly the reset value (half the flow range) instead of the random init
    I1, I2, gt = shifted_pair(12, 14)
    fr = FlowRange(-2, 2, -2, 2)
    cfg = GQMAPConfig.full_mixture(
        K=3, L=1, its=2, eval_every=2, dtype="float64", step0=0.0, tor=0.0,
    )
    plain = solve(cfg, I1, I2, gt_flow=gt, flow_range=fr, seed=5)
    assert np.asarray(plain.state.sigmau).std() > 0  # random init untouched
    res = solve(cfg, I1, I2, gt_flow=gt, flow_range=fr, seed=5, reset_at=2)
    np.testing.assert_allclose(np.asarray(res.state.sigmau), 2.0)
    np.testing.assert_allclose(np.asarray(res.state.pn), 0.0)
    np.testing.assert_allclose(np.asarray(res.state.rou), 0.0)
    # mu kept through the reset
    np.testing.assert_allclose(res.mu, plain.mu)
    assert res.iters == 2  # schedule restarted after the reset


def test_init_flow_seeds_means():
    I1, I2, gt = shifted_pair(16, 20)
    fr = FlowRange(-2, 2, -2, 2)
    cfg = GQMAPConfig.full_mixture(K=3, L=2, its=1, eval_every=1, dtype="float64")
    res = solve(cfg, I1, I2, gt_flow=gt, flow_range=fr, init_flow=gt)
    # seeded at ground truth: the first-eval AEPE is one gradient step away
    # from zero — far below the random-init first eval
    rnd = solve(cfg, I1, I2, gt_flow=gt, flow_range=fr)
    assert res.AEPE[0] < 0.2, res.AEPE[0]
    assert res.AEPE[0] < 0.3 * rnd.AEPE[0], (res.AEPE[0], rnd.AEPE[0])


@needs_data
def test_blockmatch_cli_end_to_end(tmp_path):
    # legacy/optical_flow_temp.m end to end: block-matching init -> solver ->
    # .flo export + visualization
    import os

    from gqmap_tpu.cli.main import main

    out = tmp_path / "bm"
    main([
        "run", "--seq", "RubberWhale", "--preset", "blockmatch_v2",
        "--init", "blockmatch", "--scale", "0.25", "--k", "3", "--its", "2",
        "--eval-every", "2", "--dtype", "float64", "--quiet",
        "--out", str(out),
    ])
    assert os.path.exists(out / "RubberWhale.flo")
    from gqmap_tpu.io.flo import read_flo

    flow = read_flo(out / "RubberWhale.flo")
    assert flow.ndim == 3 and flow.shape[2] == 2
    assert np.isfinite(flow).all()
