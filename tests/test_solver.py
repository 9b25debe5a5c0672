"""Engine integration tests (small synthetic problems, CPU float64)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.ndimage import gaussian_filter

from gqmap_tpu import FlowRange, GQMAPConfig
from gqmap_tpu.models.gqmap import (
    aepe_of,
    init_state,
    make_logp_fn,
    make_map_fn,
    make_problem,
    make_segment_runner,
    make_sweep,
    solve,
)


def shifted_pair(M=24, N=28, seed=0):
    r = np.random.default_rng(seed)
    I1 = gaussian_filter(r.uniform(0, 255, (M, N)), 1.5)
    I2 = np.empty_like(I1)
    I2[:, 1:] = I1[:, :-1]
    I2[:, 0] = I1[:, 0]
    gt = np.zeros((M, N, 2))
    gt[..., 0] = 1.0
    return I1, I2, gt


CFG = dict(K=5, its=60, eval_every=30, dtype="float64")


def test_solve_runs_and_is_finite():
    I1, I2, gt = shifted_pair()
    cfg = GQMAPConfig.full_mixture(L=2, **CFG)
    res = solve(cfg, I1, I2, gt_flow=gt, flow_range=FlowRange(-2, 2, -2, 2))
    assert res.iters == 60
    assert np.isfinite(res.Energy[:60]).all()
    assert np.isfinite(res.AEPE[29]) and np.isfinite(res.AEPE[59])
    assert np.isnan(res.AEPE[10])  # off-cadence entries stay NaN
    assert np.isfinite(res.logP[0])  # eval at it==1
    assert res.map.shape == (24, 28, 2)
    assert abs(res.alpha.sum() - 1) < 1e-9
    # clamps respected
    assert (np.abs(res.mu) <= 2 + 1e-12).all()
    assert (res.sigma >= 0.01 - 1e-12).all() and (res.sigma <= 23 + 1e-12).all()


def test_border_ring_frozen():
    I1, I2, gt = shifted_pair()
    cfg = GQMAPConfig.full_mixture(L=1, **CFG)
    fr = FlowRange(-2, 2, -2, 2)
    problem = make_problem(cfg, I1, I2)._replace(rng=fr)
    s0 = init_state(cfg, fr, I1.shape)
    sweep = jax.jit(make_sweep(cfg, I1.shape))
    s1, _ = sweep(problem, s0)
    for f in ("muu", "muv", "sigmau", "sigmav", "pn"):
        a0, a1 = np.asarray(getattr(s0, f)), np.asarray(getattr(s1, f))
        np.testing.assert_array_equal(a0[:, 0], a1[:, 0])
        np.testing.assert_array_equal(a0[:, -1], a1[:, -1])
        np.testing.assert_array_equal(a0[:, :, 0], a1[:, :, 0])
        np.testing.assert_array_equal(a0[:, :, -1], a1[:, :, -1])
        assert not np.array_equal(a0[:, 1:-1, 1:-1], a1[:, 1:-1, 1:-1])


def test_accuracy_improves_on_shifted_pair():
    # L=1 solver on an exactly-shifted pair must beat the init AEPE clearly.
    I1, I2, gt = shifted_pair(32, 36, seed=3)
    cfg = GQMAPConfig.full_mixture(
        K=7, L=1, its=1500, eval_every=300, dtype="float64", step_tau=800.0
    )
    res = solve(cfg, I1, I2, gt_flow=gt, flow_range=FlowRange(-2, 2, -2, 2), seed=1)
    first = res.AEPE[0]
    assert res.best_aepe < 0.55 * first, (first, res.best_aepe)


def test_early_stop_on_convergence():
    I1, I2, gt = shifted_pair()
    # tor high enough that mean |dmu| is immediately below it
    cfg = GQMAPConfig.full_mixture(L=1, tor=1e9, **CFG)
    res = solve(cfg, I1, I2, gt_flow=gt, flow_range=FlowRange(-2, 2, -2, 2))
    assert res.iters == 1


def test_super_variant_runs():
    I1, I2, gt = shifted_pair(32, 40)  # lattice 8x10
    cfg = GQMAPConfig.super_entropy(K=5, its=40, eval_every=20, dtype="float64")
    res = solve(cfg, I1, I2, gt_flow=gt, flow_range=FlowRange(-2, 2, -2, 2))
    assert res.map.shape == (8, 10, 2)
    assert np.isfinite(res.Energy[:40]).all()
    assert np.isfinite(res.AEPE[19])
    # temperature annealed? anneal_every=500 > 40 iters, so unchanged
    assert float(res.state.temperature) == pytest.approx(0.2)


def test_super_annealing():
    I1, I2, gt = shifted_pair(16, 16)
    cfg = GQMAPConfig.super_entropy(
        K=3, its=25, eval_every=100, anneal_every=10, dtype="float64"
    )
    res = solve(cfg, I1, I2, gt_flow=gt, flow_range=FlowRange(-2, 2, -2, 2))
    # two decays at it=10 and it=20: 0.2 * 0.75^2
    assert float(res.state.temperature) == pytest.approx(0.2 * 0.75**2)


def test_energy_consistency_with_logp():
    # With sigma at the minimum clamp and pn=rou=0 and T=0, the expected
    # energy approaches the true log posterior of the mean flow; just check
    # logp_fn runs and is consistent in scale with Energy.
    I1, I2, gt = shifted_pair()
    cfg = GQMAPConfig.full_mixture(L=1, **CFG)
    fr = FlowRange(-2, 2, -2, 2)
    problem = make_problem(cfg, I1, I2)._replace(rng=fr)
    logp = make_logp_fn(cfg, I1.shape)
    flow = jnp.zeros((24, 28, 2), jnp.float64)
    val = float(logp(problem, flow))
    assert np.isfinite(val) and val < 0


def test_nearest_data_term_close_to_bicubic():
    I1, I2, gt = shifted_pair()
    fr = FlowRange(-2, 2, -2, 2)
    outs = []
    for dt in ("bicubic", "nearest"):
        cfg = GQMAPConfig.full_mixture(L=1, data_term=dt, rfc=6, **CFG)
        problem = make_problem(cfg, I1, I2)._replace(rng=fr)
        s0 = init_state(cfg, fr, I1.shape)
        sweep = jax.jit(make_sweep(cfg, I1.shape))
        s1, aux = sweep(problem, s0)
        outs.append(float(aux.energy))
    # 64x-upsampled nearest lookup approximates the exact bicubic energy
    assert abs(outs[0] - outs[1]) / abs(outs[0]) < 2e-3, outs


def test_projsplx_alpha_mode():
    I1, I2, gt = shifted_pair()
    cfg = GQMAPConfig.full_mixture(
        L=3, alpha_update="projsplx", alpha_start=0, **CFG
    )
    res = solve(cfg, I1, I2, gt_flow=gt, flow_range=FlowRange(-2, 2, -2, 2))
    assert abs(res.alpha.sum() - 1) < 1e-9 and (res.alpha >= 0).all()


def test_chebyshev_data_term_close_to_exact():
    # spectral (gather-free) data term: potential values close to exact
    # bicubic over the displacement box, and one sweep stays consistent
    from gqmap_tpu.models.gqmap import _node_f
    import jax.numpy as jnp

    I1, I2, gt = shifted_pair(24, 32)
    fr = FlowRange(-2, 2, -2, 2)
    cfg_ex = GQMAPConfig.single_gaussian(K=5, dtype="float64")
    cfg_ch = GQMAPConfig.single_gaussian(
        K=5, dtype="float64", data_term="chebyshev", cheb_p=48, cheb_q=48,
        cheb_margin=1.0,
    )
    pe = make_problem(cfg_ex, I1, I2, fr)
    pc = make_problem(cfg_ch, I1, I2, fr)
    r = np.random.default_rng(0)
    x1 = jnp.asarray(r.uniform(-2.5, 2.5, (3, 1, 24, 32)))
    x2 = jnp.asarray(r.uniform(-2.5, 2.5, (3, 1, 24, 32)))
    ve = np.asarray(_node_f(cfg_ex, pe)(x1, x2))
    vc = np.asarray(_node_f(cfg_ch, pc)(x1, x2))
    scale = np.abs(ve).max()
    assert np.abs(ve - vc).mean() / scale < 0.01
    # a solve step runs end to end
    cfg_run = GQMAPConfig.single_gaussian(
        K=5, its=10, eval_every=5, dtype="float64",
        data_term="chebyshev", cheb_p=32, cheb_q=32,
    )
    res = solve(cfg_run, I1, I2, gt_flow=gt, flow_range=fr)
    assert np.isfinite(res.Energy[:10]).all()


def test_legacy_v1_quadratic_family():
    # quadratic node prior toward an init flow + truncated-quadratic edges
    # (legacy/gqmap_cpu.m); with a dominant prior the means track the init
    from gqmap_tpu.models.gqmap import make_problem as mk

    I1, I2, gt = shifted_pair()
    init = np.zeros((24, 28, 2))
    init[..., 0] = 1.25
    cfg = GQMAPConfig.legacy_v1(K=5, its=300, eval_every=150, dtype="float64",
                                quad_var=0.05)
    import jax.numpy as jnp

    fr = FlowRange(-2, 2, -2, 2)
    problem = mk(cfg, I1, I2, fr)._replace(init_flow=jnp.asarray(init))
    from gqmap_tpu.models.gqmap import init_state, make_segment_runner

    state = init_state(cfg, fr, I1.shape)
    seg = make_segment_runner(cfg, I1.shape)
    state, n, *_ = seg(problem, state, 300)
    mu_u = np.asarray(state.muu)[0, 1:-1, 1:-1]
    assert abs(np.median(mu_u) - 1.25) < 0.15, np.median(mu_u)


@pytest.mark.parametrize("edge_quad", ["tensor", "reduced"])
def test_autodiff_estimator_matches_stein(edge_quad):
    # With POLYNOMIAL potentials (quadratic node prior, untruncated
    # quadratic edges) the K^2 quadrature is exact, so the Stein identities
    # and jax.grad of the quadrature expectation must agree to roundoff.
    # (On rough integrands — Charbonnier of a textured image — the two
    # estimator families differ by genuine quadrature error, exactly like
    # the reference's gpuV2 vs gpuV3 lineages.) The reduced 1-D edge rule
    # is likewise exact on the quadratic edge, so the agreement must hold
    # per edge_quad mode — covering gq_ei_diff on the autodiff path.
    import jax

    I1, I2, gt = shifted_pair(16, 20)
    fr = FlowRange(-2, 2, -2, 2)
    init = np.zeros((16, 20, 2))
    init[..., 0] = 1.0
    outs = {}
    for est in ("stein", "autodiff"):
        cfg = GQMAPConfig.legacy_v1(
            K=7, L=2, dtype="float64", gradient_estimator=est,
            dta=1e9, temperature=0.1, alpha_start=0, edge_quad=edge_quad,
        )
        problem = make_problem(cfg, I1, I2, fr)._replace(init_flow=jnp.asarray(init))
        st = init_state(cfg, fr, I1.shape)
        st = st._replace(it=np.int32(600) * jnp.ones((), jnp.int32))
        sweep = jax.jit(make_sweep(cfg, I1.shape))
        outs[est] = sweep(problem, st)
    s1, a1 = outs["stein"]
    s2, a2 = outs["autodiff"]
    np.testing.assert_allclose(float(a1.energy), float(a2.energy), rtol=1e-10)
    for f in ("muu", "muv", "sigmau", "sigmav", "pn", "rou", "w"):
        np.testing.assert_allclose(
            np.asarray(getattr(s2, f)), np.asarray(getattr(s1, f)),
            rtol=1e-8, atol=1e-10, err_msg=f,
        )


def test_chebyshev_super_patch():
    # spectral term with patch=4: coefficients expand the PATCH-SUMMED node
    # potential, so values must match the exact super data term
    from gqmap_tpu.models.gqmap import _node_f
    import jax.numpy as jnp

    I1, I2, gt = shifted_pair(32, 40)
    fr = FlowRange(-2, 2, -2, 2)
    cfg_ex = GQMAPConfig.super_entropy(K=3, dtype="float64")
    cfg_ch = GQMAPConfig.super_entropy(
        K=3, dtype="float64", data_term="chebyshev", cheb_p=48, cheb_q=48,
        cheb_margin=1.0,
    )
    pe = make_problem(cfg_ex, I1, I2, fr)
    pc = make_problem(cfg_ch, I1, I2, fr)
    r = np.random.default_rng(0)
    x1 = jnp.asarray(r.uniform(-2, 2, (2, 1, 8, 10)))
    x2 = jnp.asarray(r.uniform(-2, 2, (2, 1, 8, 10)))
    ve = np.asarray(_node_f(cfg_ex, pe)(x1, x2))
    vc = np.asarray(_node_f(cfg_ch, pc)(x1, x2))
    assert np.abs(ve - vc).mean() / np.abs(ve).max() < 0.01


def test_tpu_fast_super_preset_runs_and_improves():
    # flagship-accuracy fast preset: cosine closed-form data term over the
    # PATCH-SUMMED potential (patch=4) + reduced 1-D edges, end to end
    I1, I2, gt = shifted_pair(32, 40, seed=3)
    cfg = GQMAPConfig.tpu_fast_super(
        K=5, its=600, eval_every=200, dtype="float64",
        cheb_p=48, cheb_q=48, step0=0.01, step_tau=400.0,
    )
    res = solve(cfg, I1, I2, gt_flow=gt, flow_range=FlowRange(-2, 2, -2, 2), seed=1)
    assert res.map.shape == (8, 10, 2)
    assert np.isfinite(res.Energy[:600]).all()
    assert res.best_aepe < 0.7 * res.AEPE[199], (res.AEPE[199], res.best_aepe)


def test_seeded_regression_lock():
    # deterministic seeded run on a fixed synthetic pair: locks the exact
    # AEPE/Energy trajectory (float64 CPU) against silent numeric drift
    I1, I2, gt = shifted_pair(24, 28, seed=0)
    cfg = GQMAPConfig.full_mixture(K=5, L=2, its=200, eval_every=100, dtype="float64")
    res = solve(cfg, I1, I2, gt_flow=gt, flow_range=FlowRange(-2, 2, -2, 2), seed=7)
    np.testing.assert_allclose(res.AEPE[99], 1.7480420553231795, rtol=1e-10)
    np.testing.assert_allclose(res.AEPE[199], 1.6825042895488336, rtol=1e-10)
    np.testing.assert_allclose(res.Energy[199], -45189.2677513013, rtol=1e-9)


def test_redblack_equals_jacobi_when_uncoupled():
    # with lambdas=0 and T=0 the edge terms vanish, so sites are independent
    # and checkerboard Gauss-Seidel must EQUAL the synchronous Jacobi sweep
    # exactly (each site's update depends on its own state only)
    I1, I2, gt = shifted_pair()
    fr = FlowRange(-2, 2, -2, 2)
    base = GQMAPConfig.full_mixture(L=2, lambdas=0.0, **CFG)
    st0 = init_state(base, fr, I1.shape)
    outs = {}
    for order in ("jacobi", "redblack"):
        cfg = GQMAPConfig.full_mixture(L=2, lambdas=0.0, sweep_order=order, **CFG)
        problem = make_problem(cfg, I1, I2, fr)
        sweep = jax.jit(make_sweep(cfg, I1.shape))
        st, aux = sweep(problem, st0)
        outs[order] = (st, aux)
    a, b = outs["jacobi"][0], outs["redblack"][0]
    for f in ("muu", "muv", "sigmau", "sigmav", "pn", "rou"):
        np.testing.assert_allclose(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
            rtol=1e-12, atol=1e-12, err_msg=f,
        )
    np.testing.assert_allclose(
        float(outs["jacobi"][1].ptdmu), float(outs["redblack"][1].ptdmu), rtol=1e-9
    )


def test_redblack_half_steps_are_sequential():
    # with coupling on, the black half must see the red half's FRESH values:
    # one red-black sweep differs from Jacobi, and only interior sites move
    I1, I2, gt = shifted_pair()
    fr = FlowRange(-2, 2, -2, 2)
    cfg_j = GQMAPConfig.full_mixture(L=1, **CFG)
    cfg_rb = GQMAPConfig.full_mixture(L=1, sweep_order="redblack", **CFG)
    st0 = init_state(cfg_j, fr, I1.shape)
    pj = make_problem(cfg_j, I1, I2, fr)
    sj = jax.jit(make_sweep(cfg_j, I1.shape))
    srb = jax.jit(make_sweep(cfg_rb, I1.shape))
    stj, _ = sj(pj, st0)
    strb, _ = srb(pj, st0)
    dj = np.asarray(stj.muu) - np.asarray(st0.muu)
    drb = np.asarray(strb.muu) - np.asarray(st0.muu)
    assert np.max(np.abs(dj - drb)) > 1e-12  # Gauss-Seidel != Jacobi
    # red sites' updates coincide (they both start from st0)
    M, N = I1.shape
    red = ((np.add.outer(np.arange(M), np.arange(N))) & 1) == 0
    np.testing.assert_allclose(dj[:, red], drb[:, red], rtol=1e-12, atol=1e-14)
    # frozen border stays frozen
    border = np.zeros((M, N), bool)
    border[0] = border[-1] = True
    border[:, 0] = border[:, -1] = True
    assert np.abs(drb[:, border]).max() == 0.0


def test_redblack_converges_on_shifted_pair():
    # same workload/config the Jacobi improvement test pins down — the
    # checkerboard order must also clearly beat its init AEPE
    I1, I2, gt = shifted_pair(32, 36, seed=3)
    cfg = GQMAPConfig.full_mixture(
        K=7, L=1, its=1500, eval_every=300, dtype="float64", step_tau=800.0,
        sweep_order="redblack",
    )
    res = solve(cfg, I1, I2, gt_flow=gt, flow_range=FlowRange(-2, 2, -2, 2), seed=1)
    assert np.isfinite(res.Energy[: res.iters]).all()
    first = res.AEPE[0]
    assert res.best_aepe < 0.55 * first, (first, res.best_aepe)


def test_energy_ascends_before_convergence():
    # The reference's de-facto regression signal is the per-iteration
    # Energy / logP trace (gqmap_gpu_mixture.m:48,66,71-72): on a seeded
    # improving workload the expected-energy trend over eval windows must
    # ascend and logP at the extracted MAP must be finite and improve.
    # A step-size or sign regression in finalize() fails here directly.
    I1, I2, gt = shifted_pair(32, 36, seed=3)
    cfg = GQMAPConfig.full_mixture(
        K=7, L=1, its=900, eval_every=300, dtype="float64", step_tau=800.0
    )
    res = solve(cfg, I1, I2, gt_flow=gt, flow_range=FlowRange(-2, 2, -2, 2), seed=1)
    e = res.Energy[: res.iters]
    assert np.isfinite(e).all()
    wins = [e[i : i + 300].mean() for i in range(0, 900, 300)]
    assert wins[1] > wins[0] and wins[2] > wins[1], wins
    lp = res.logP[np.isfinite(res.logP)]
    assert lp.size >= 3 and lp[-1] > lp[0]
