"""Per-component timing of the flagship sweep (node vs edge vs rest).

Measurement rule (PERFORMANCE.md): literal fetches only; dependency-chained
repeats so the device cannot overlap the timed region with the fetch.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gqmap_tpu.config import GQMAPConfig
from gqmap_tpu.models.gqmap import init_state, make_problem, make_sweep, _node_f
from gqmap_tpu.ops.gq import gq_accumulate
from gqmap_tpu.ops.potentials import make_edge_pot
from gqmap_tpu.ops.quadrature import build_table


def timeit(fn, *args, reps=8):
    out = fn(*args)
    jax.block_until_ready(out)
    # sync via literal fetch of a scalar derived from the output
    s = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(s))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    s = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(s))
    return (time.time() - t0) / reps


def main():
    from bench import load_problem_images

    I1, I2, fr = load_problem_images()
    # explicit chebyshev: tpu_fast defaults to the closed-form cosine term,
    # for which _node_f returns None (no per-sample potential callable)
    cfg = GQMAPConfig.tpu_fast(dtype="float32", edge_quad="tensor", data_term="chebyshev")
    problem = make_problem(cfg, I1, I2, fr)
    state = init_state(cfg, fr, I1.shape)
    tab = build_table(cfg.K, cfg.quad_chunk, jnp.float32)

    # full sweep
    sweep = jax.jit(make_sweep(cfg, I1.shape))
    t_full = timeit(lambda p, s: sweep(p, s)[0], problem, state)
    print(f"full sweep:        {t_full*1e3:8.2f} ms")

    # node only
    @jax.jit
    def node_only(problem, state):
        node_f = _node_f(cfg, problem)
        return gq_accumulate(node_f, state.muu, state.muv, state.sigmau,
                             state.sigmav, state.pn, tab)

    t_node = timeit(node_only, problem, state)
    print(f"node gq (cheb):    {t_node*1e3:8.2f} ms")

    # edge only
    edge_f = make_edge_pot(cfg.lambdas, cfg.epsn)

    @jax.jit
    def edge_only(state):
        mu = jnp.stack([state.muu, state.muv], axis=0)
        sg = jnp.stack([state.sigmau, state.sigmav], axis=0)
        u2e = jnp.stack([jnp.roll(mu, -1, -2), jnp.roll(mu, -1, -1)], axis=0)
        o2e = jnp.stack([jnp.roll(sg, -1, -2), jnp.roll(sg, -1, -1)], axis=0)
        return gq_accumulate(edge_f, mu[None], u2e, sg[None], o2e, state.rou, tab)

    t_edge = timeit(edge_only, state)
    print(f"edge gq (tensor):  {t_edge*1e3:8.2f} ms")
    print(f"rest (full-n-e):   {(t_full - t_node - t_edge)*1e3:8.2f} ms")

    # reduced edge
    from gqmap_tpu.ops.gq import gq_accumulate_diff
    from gqmap_tpu.ops.potentials import make_edge_pot_diff
    from gqmap_tpu.ops.quadrature import build_table_1d

    edge_fd = make_edge_pot_diff(cfg.lambdas, cfg.epsn)
    tab1 = build_table_1d(2 * cfg.K + 3, dtype=jnp.float32)

    @jax.jit
    def edge_reduced(state):
        mu = jnp.stack([state.muu, state.muv], axis=0)
        sg = jnp.stack([state.sigmau, state.sigmav], axis=0)
        u2e = jnp.stack([jnp.roll(mu, -1, -2), jnp.roll(mu, -1, -1)], axis=0)
        o2e = jnp.stack([jnp.roll(sg, -1, -2), jnp.roll(sg, -1, -1)], axis=0)
        return gq_accumulate_diff(edge_fd, mu[None], u2e, sg[None], o2e, state.rou, tab1)

    t_edge_r = timeit(edge_reduced, state)
    print(f"edge gq (reduced): {t_edge_r*1e3:8.2f} ms")

    # full sweep with reduced edges
    cfg2 = GQMAPConfig.tpu_fast(dtype="float32")
    assert cfg2.edge_quad == "reduced"
    sweep2 = jax.jit(make_sweep(cfg2, I1.shape))
    problem2 = make_problem(cfg2, I1, I2, fr)
    t_full2 = timeit(lambda p, s: sweep2(p, s)[0], problem2, state)
    print(f"full sweep (tpu_fast, reduced edges): {t_full2*1e3:8.2f} ms")

    # cosine node term (closed form)
    from gqmap_tpu.ops.cosine import cos_node_grads
    from gqmap_tpu.ops.gq import NODE

    cfg3 = GQMAPConfig.tpu_fast(dtype="float32", data_term="cosine")
    problem3 = make_problem(cfg3, I1, I2, fr)

    @jax.jit
    def node_cos(problem, state):
        a3 = jnp.ones((cfg3.L, 1, 1), jnp.float32) / cfg3.L
        return cos_node_grads(problem.cheb, state.muu, state.muv, state.sigmau,
                              state.sigmav, state.pn, a3, 0.0, NODE, cfg3.cheb_ablock)

    t_node_c = timeit(node_cos, problem3, state)
    print(f"node (cosine CF):  {t_node_c*1e3:8.2f} ms")

    sweep3 = jax.jit(make_sweep(cfg3, I1.shape))
    t_full3 = timeit(lambda p, s: sweep3(p, s)[0], problem3, state)
    print(f"full sweep (cosine + reduced edges): {t_full3*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
