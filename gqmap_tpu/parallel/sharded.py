"""Mesh-sharded GQMAP sweeps (pjit / GSPMD path).

The single-device sweep (:mod:`gqmap_tpu.models.gqmap`) is already one pure
XLA program over the whole lattice, so distribution is sharding-annotation
only: jit the same function with NamedShardings and let the SPMD partitioner
insert the halo collective-permutes (for ``jnp.roll``) and psums (for the
Energy/dalpha/|dmu| scalars). This is the idiomatic TPU equivalent of the
reference's planned-but-never-written distributed backend
(``legacy/gqmap_cuda.m``). The frame constants are replicated (~1 MB at
Middlebury scale; every node's bounded-range bicubic gather may touch an
arbitrary window of frame 2).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import GQMAPConfig
from ..models.gqmap import GQState, Problem, make_sweep
from .mesh import state_sharding

__all__ = [
    "problem_sharding",
    "make_sharded_sweep",
    "make_batched_sharded_sweep",
    "shard_state",
    "shard_problem",
    "stack_states",
]


def problem_sharding(mesh: Mesh, problem: Problem | None = None) -> Problem:
    """Replicated shardings mirroring the problem's pytree structure."""
    rep = NamedSharding(mesh, P())
    from ..config import FlowRange

    cheb = None
    if problem is not None and problem.cheb is not None:
        from ..ops.chebyshev import ChebData

        cheb = ChebData(rep, rep, rep, rep, rep)
    return Problem(I1=rep, I2_tab=rep, interior=rep,
                   rng=FlowRange(rep, rep, rep, rep), cheb=cheb)


def shard_problem(problem: Problem, mesh: Mesh) -> Problem:
    rep = NamedSharding(mesh, P())
    return Problem(
        I1=jax.device_put(problem.I1, rep),
        I2_tab=jax.device_put(problem.I2_tab, rep),
        interior=jax.device_put(problem.interior, rep),
        rng=problem.rng,
    )


def shard_state(state: GQState, mesh: Mesh, batched: bool = False) -> GQState:
    shardings = state_sharding(mesh, batched)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)


def make_sharded_sweep(cfg: GQMAPConfig, image_shape, mesh: Mesh):
    """jit-compiled sweep with the lattice block-sharded over (x, y)."""
    sweep = make_sweep(cfg, image_shape)
    sh = state_sharding(mesh, batched=False)
    return jax.jit(sweep, in_shardings=(problem_sharding(mesh), sh))


def make_batched_sharded_sweep(cfg: GQMAPConfig, image_shape, mesh: Mesh):
    """vmapped sweep: leading batch axis sharded over dp, lattice over (x, y).

    This is the full parallelism stack — DP over sequences x 2-D spatial
    decomposition — in one jitted program.
    """
    sweep = make_sweep(cfg, image_shape)
    vsweep = jax.vmap(sweep, in_axes=(None, 0))
    sh = state_sharding(mesh, batched=True)
    return jax.jit(vsweep, in_shardings=(problem_sharding(mesh), sh))


def stack_states(states: list[GQState]) -> GQState:
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *states)
