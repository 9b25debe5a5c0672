"""In-segment component profile of the flagship (tpu_fast) sweep.

Decomposes the production sweep into its three phases and times each with
the roofline module's two-trip-count differencing (one compiled program,
traced ``fori_loop`` trip count, sequential dependence between iterations)
— the only measurement that survives the tunneled runtime's ~25 ms
round-trip jitter (see kernels/roofline.py docstring). Components:

  A. cosine node path     = phase precompute + Pallas mode-sum kernel
                            + closed-form finalize (gn)
  B. edge path            = stack/roll neighbor prep + fused reduced-edge
                            Pallas kernel (ge)
  C. assembly + update    = roll-scatter gradient assembly, clamped ascent,
                            alpha step, energy/dalpha/|dmu| reductions
                            (measured with gn/ge precomputed)
  F. full sweep           = everything, same loop shape

A+B+C should bracket F; the gap is fusion overlap/XLA scheduling. Appends
one JSON line to results/profile_flagship.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gqmap_tpu.config import FlowRange, GQMAPConfig
from gqmap_tpu.kernels.roofline import timed
from gqmap_tpu.models.gqmap import init_state, make_problem, make_sweep

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "profile_flagship.jsonl")


def main(image_shape=(376, 452), A=96, B=16, n1=8, n2=58):
    M, N = image_shape
    r = np.random.default_rng(0)
    I1 = r.uniform(0, 255, (M, N))
    I2 = np.roll(I1, 1, axis=1)
    fr = FlowRange(-10.0, 2.0, -2.0, 2.0)
    cfg = GQMAPConfig.tpu_fast(dtype="float32", cheb_p=A, cheb_q=B)
    problem = make_problem(cfg, I1, I2, fr)
    state = init_state(cfg, fr, I1.shape)
    dt = jnp.float32
    eps = jnp.asarray(1e-30, dt)

    sweep = make_sweep(cfg, I1.shape)

    # --- F: full sweep, sequential self-dependence through the state ---
    def floop(problem, state, n):
        def body(i, st):
            st2, aux = sweep(problem, st)
            return st2

        return jax.lax.fori_loop(0, n, body, state).muu

    t_full = timed(floop, problem, state, n1=n1, n2=n2)

    # --- A: cosine node path (phases + Pallas kernel + finalize) ---
    from gqmap_tpu.kernels.cosine_gq import cos_node_grads_pallas
    from gqmap_tpu.ops.gq import NODE

    a3 = jnp.full((cfg.L, 1, 1), 1.0 / cfg.L, dt)

    def nloop(problem, state, n):
        def body(i, acc):
            gn = cos_node_grads_pallas(
                problem.cheb, state.muu + acc, state.muv, state.sigmau,
                state.sigmav, state.pn, a3, jnp.asarray(0.0, dt), NODE,
                a_block=cfg.cheb_ablock,
            )
            return gn.du1.ravel()[0] * eps

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), dt))

    t_node = timed(nloop, problem, state, n1=n1, n2=n2)

    # --- B: edge path (neighbor prep + fused reduced-edge kernel) ---
    from gqmap_tpu.kernels.edge_reduced_gq import edge_reduced_grads_pallas

    k1 = 2 * cfg.K + 3
    alpha = jnp.full((cfg.L,), 1.0 / cfg.L, dt)

    def eloop(state, n):
        def body(i, acc):
            mu = jnp.stack([state.muu + acc, state.muv], axis=0)
            sg = jnp.stack([state.sigmau, state.sigmav], axis=0)
            u2e = jnp.stack([jnp.roll(mu, -1, -2), jnp.roll(mu, -1, -1)], axis=0)
            o2e = jnp.stack([jnp.roll(sg, -1, -2), jnp.roll(sg, -1, -1)], axis=0)
            from gqmap_tpu.ops.gq import EDGE

            ge = edge_reduced_grads_pallas(
                mu, sg, u2e, o2e, state.rou, alpha, jnp.asarray(0.0, dt),
                k1, cfg.lambdas, cfg.epsn, EDGE,
            )
            return ge.du1.ravel()[0] * eps

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), dt))

    t_edge = timed(eloop, state, n1=n1, n2=n2)

    # --- C: assembly + clamped update + reductions, gn/ge precomputed ---
    from gqmap_tpu.kernels.edge_reduced_gq import edge_reduced_grads_pallas as _ek
    from gqmap_tpu.ops.gq import EDGE

    def precompute(problem, state):
        gn = cos_node_grads_pallas(
            problem.cheb, state.muu, state.muv, state.sigmau,
            state.sigmav, state.pn, a3, jnp.asarray(0.0, dt), NODE,
            a_block=cfg.cheb_ablock,
        )
        mu = jnp.stack([state.muu, state.muv], axis=0)
        sg = jnp.stack([state.sigmau, state.sigmav], axis=0)
        u2e = jnp.stack([jnp.roll(mu, -1, -2), jnp.roll(mu, -1, -1)], axis=0)
        o2e = jnp.stack([jnp.roll(sg, -1, -2), jnp.roll(sg, -1, -1)], axis=0)
        ge = _ek(mu, sg, u2e, o2e, state.rou, alpha, jnp.asarray(0.0, dt),
                 k1, cfg.lambdas, cfg.epsn, EDGE)
        return gn, ge

    gn0, ge0 = jax.jit(precompute)(problem, state)
    interior = problem.interior
    rngv = problem.rng
    step = jnp.asarray(cfg.step0, dt)

    def aloop(gn, ge, state, n):
        def assemble(dn, d1, d2, chan):
            return (dn + d1[0, chan] + d1[1, chan]
                    + jnp.roll(d2[0, chan], 1, -2) + jnp.roll(d2[1, chan], 1, -1))

        def body(i, carry):
            acc, _ = carry
            dmuu = assemble(gn.du1 + acc, ge.du1, ge.du2, 0)
            dmuv = assemble(gn.du2, ge.du1, ge.du2, 1)
            dsigmau = assemble(gn.do1, ge.do1, ge.do2, 0)
            dsigmav = assemble(gn.do2, ge.do1, ge.do2, 1)
            energy = (jnp.sum(jnp.where(interior, gn.E, 0))
                      + jnp.sum(jnp.where(interior, ge.E, 0)))
            dalpha = (jnp.sum(jnp.where(interior, gn.da, 0), axis=(-2, -1))
                      + jnp.sum(jnp.where(interior, ge.da, 0), axis=(0, 1, -2, -1)))
            muu = jnp.where(interior, jnp.clip(state.muu + dmuu * step, rngv.minu, rngv.maxu), state.muu)
            muv = jnp.where(interior, jnp.clip(state.muv + dmuv * step, rngv.minv, rngv.maxv), state.muv)
            sigmau = jnp.where(interior, jnp.clip(state.sigmau + dsigmau * step, cfg.sigma_min, cfg.sigma_max), state.sigmau)
            sigmav = jnp.where(interior, jnp.clip(state.sigmav + dsigmav * step, cfg.sigma_min, cfg.sigma_max), state.sigmav)
            ptdmu = jnp.sum(jnp.where(interior, jnp.abs(dmuu), 0))
            out = (muu.ravel()[0] + muv.ravel()[0] + sigmau.ravel()[0]
                   + sigmav.ravel()[0] + energy + dalpha[0] + ptdmu)
            return (out * eps, out)

        return jax.lax.fori_loop(0, n, body, (jnp.zeros((), dt), jnp.zeros((), dt)))[1]

    t_asm = timed(aloop, gn0, ge0, state, n1=n1, n2=n2)

    rec = dict(
        shape=[M, N], L=cfg.L, A=A, B=B, n1=n1, n2=n2,
        full_ms=round(t_full * 1e3, 3),
        node_path_ms=round(t_node * 1e3, 3),
        edge_path_ms=round(t_edge * 1e3, 3),
        assembly_update_ms=round(t_asm * 1e3, 3),
        sum_components_ms=round((t_node + t_edge + t_asm) * 1e3, 3),
        mpix_sweeps_per_s=round(M * N / t_full / 1e6, 3),
        backend=jax.default_backend(),
        ts=time.strftime("%Y-%m-%dT%H:%M:%S"),
    )
    print(json.dumps(rec, indent=2))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
