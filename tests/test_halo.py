"""Explicit shard_map halo-exchange sweep == single-device sweep."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh
from scipy.ndimage import gaussian_filter

from gqmap_tpu import FlowRange, GQMAPConfig
from gqmap_tpu.models.gqmap import init_state, make_problem, make_sweep
from gqmap_tpu.parallel.halo import make_halo_sweep

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


def build(cfg, M, N, seed=0):
    r = np.random.default_rng(seed)
    I1 = gaussian_filter(r.uniform(0, 255, (M, N)), 1.5)
    I2 = np.roll(I1, 1, axis=1)
    fr = FlowRange(-2, 2, -2, 2)
    problem = make_problem(cfg, I1, I2)._replace(rng=fr)
    state = init_state(cfg, fr, I1.shape)
    return problem, state


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (1, 8)])
def test_halo_sweep_matches_single(mesh_shape):
    cfg = GQMAPConfig.full_mixture(K=5, L=2, dtype="float64")
    M, N = 16, 16
    problem, state = build(cfg, M, N)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(mesh_shape), ("x", "y"))

    ref = jax.jit(make_sweep(cfg, (M, N)))
    halo = make_halo_sweep(cfg, (M, N), mesh)

    s_ref, a_ref = state, None
    s_halo = state
    for _ in range(3):
        s_ref, a_ref = ref(problem, s_ref)
        s_halo, a_halo = halo(problem, s_halo)
    for f in state._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(s_halo, f)), np.asarray(getattr(s_ref, f)),
            rtol=1e-9, atol=1e-12, err_msg=f,
        )
    np.testing.assert_allclose(float(a_halo.energy), float(a_ref.energy), rtol=1e-9)
    np.testing.assert_allclose(float(a_halo.ptdmu), float(a_ref.ptdmu), rtol=1e-9)


@pytest.mark.parametrize("data_term", ["cosine", "chebyshev"])
def test_halo_spectral_terms_match_single(data_term):
    # the flagship fast path under the explicit ppermute halo sweep: the
    # spectral node terms are gather-free and local per pixel, fed by the
    # lattice-sharded coefficient blocks
    cfg = GQMAPConfig.tpu_fast(
        K=5, L=2, dtype="float64", data_term=data_term,
        cheb_p=24, cheb_q=12, quad_chunk=0,
    )
    M, N = 16, 16
    r = np.random.default_rng(0)
    I1 = gaussian_filter(r.uniform(0, 255, (M, N)), 1.5)
    I2 = np.roll(I1, 1, axis=1)
    fr = FlowRange(-2, 2, -2, 2)
    problem = make_problem(cfg, I1, I2, fr)
    state = init_state(cfg, fr, I1.shape)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("x", "y"))

    ref = jax.jit(make_sweep(cfg, (M, N)))
    halo = make_halo_sweep(cfg, (M, N), mesh)
    s_ref, a_ref = state, None
    s_halo = state
    for _ in range(3):
        s_ref, a_ref = ref(problem, s_ref)
        s_halo, a_halo = halo(problem, s_halo)
    for f in state._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(s_halo, f)), np.asarray(getattr(s_ref, f)),
            rtol=1e-9, atol=1e-12, err_msg=f,
        )
    np.testing.assert_allclose(float(a_halo.energy), float(a_ref.energy), rtol=1e-9)


def test_halo_quadratic_init_flow():
    # legacy_v1 (quadratic node prior toward an init flow) under the halo
    # path: init_flow blocks ride in via the P(x, y, None) spec
    import jax.numpy as jnp

    cfg = GQMAPConfig.legacy_v1(K=5, L=1, dtype="float64")
    M, N = 16, 16
    r = np.random.default_rng(0)
    I1 = gaussian_filter(r.uniform(0, 255, (M, N)), 1.5)
    I2 = np.roll(I1, 1, axis=1)
    fr = FlowRange(-2, 2, -2, 2)
    init = np.zeros((M, N, 2))
    init[..., 0] = 1.0
    problem = make_problem(cfg, I1, I2, fr)._replace(init_flow=jnp.asarray(init))
    state = init_state(cfg, fr, I1.shape)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("x", "y"))
    ref = jax.jit(make_sweep(cfg, (M, N)))
    halo = make_halo_sweep(cfg, (M, N), mesh)
    s_ref, _ = ref(problem, state)
    s_halo, _ = halo(problem, state)
    np.testing.assert_allclose(
        np.asarray(s_halo.muu), np.asarray(s_ref.muu), rtol=1e-9, atol=1e-12
    )


def test_halo_super_variant():
    cfg = GQMAPConfig.super_entropy(K=3, dtype="float64")
    M, N = 32, 32  # lattice 8x8 over a (2, 2) mesh, 4x4 image patches
    problem, state = build(cfg, M, N)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("x", "y"))
    ref = jax.jit(make_sweep(cfg, (M, N)))
    halo = make_halo_sweep(cfg, (M, N), mesh)
    s_ref, _ = ref(problem, state)
    s_halo, _ = halo(problem, state)
    np.testing.assert_allclose(
        np.asarray(s_halo.muu), np.asarray(s_ref.muu), rtol=1e-9, atol=1e-12
    )


def test_halo_redblack_matches_single():
    # checkerboard half-steps exchange halos twice per sweep; the global
    # parity (shard-origin-offset) must make the N-shard sweep identical
    cfg = GQMAPConfig.full_mixture(K=5, L=2, dtype="float64", sweep_order="redblack")
    M, N = 16, 16
    problem, state = build(cfg, M, N)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("x", "y"))
    ref = jax.jit(make_sweep(cfg, (M, N)))
    halo = make_halo_sweep(cfg, (M, N), mesh)
    s_ref = s_halo = state
    for _ in range(3):
        s_ref, a_ref = ref(problem, s_ref)
        s_halo, a_halo = halo(problem, s_halo)
    for f in state._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(s_halo, f)), np.asarray(getattr(s_ref, f)),
            rtol=1e-9, atol=1e-12, err_msg=f,
        )
    np.testing.assert_allclose(float(a_halo.energy), float(a_ref.energy), rtol=1e-9)
