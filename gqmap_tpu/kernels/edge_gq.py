"""Pallas TPU kernel: fused edge-quadrature accumulation.

The XLA path (:func:`gqmap_tpu.ops.gq.gq_accumulate`) scans over quadrature
chunks, round-tripping the six accumulators (and per-chunk sample
intermediates) through HBM every step. This kernel fuses the whole K^2
loop in VMEM: each grid step owns a (rows, N) tile of the
(dir*chan*L, M, N) lattice, runs the quadrature loop with the tables held
on-chip, and writes the six raw sums once — HBM traffic drops from
O(K^2/chunk) state reads to exactly one read + one write per array.

Edge potential: Charbonnier ``-lambda_s sqrt(eps + (x1 - x2)^2)``
(``gqmap_gpu_mixture.m:180-182``); accumulation identities as in
``ops/gq.py`` (the spectral transform of ``edge_grad_spectral``,
``gqmap_gpu_mixture.m:118-146``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.gq import GQRaw
from ..ops.quadrature import QuadTable, gauss_hermite

__all__ = ["edge_gq_pallas", "pack_table"]

_SQRT2 = math.sqrt(2.0)


def pack_table(K: int, dtype=np.float32) -> np.ndarray:
    """(6, K^2) table: xi, xj, wiwj, xixj, x2a, x2m rows."""
    x, w = gauss_hermite(K)
    xi = np.tile(x[None, :], (K, 1)).reshape(-1)
    xj = np.tile(x[:, None], (1, K)).reshape(-1)
    wi = np.tile(w[None, :], (K, 1)).reshape(-1)
    wj = np.tile(w[:, None], (1, K)).reshape(-1)
    return np.stack(
        [xi, xj, wi * wj, xi * xj, xi**2 + xj**2, xi**2 - xj**2]
    ).astype(dtype)


def _kernel(tab_ref, u1_ref, u2_ref, o1_ref, o2_ref, p_ref,
            ei_ref, z1_ref, z2_ref, sa_ref, sm_ref, sxy_ref,
            *, K2: int, lam: float, eps: float):
    u1 = u1_ref[...]
    u2 = u2_ref[...]
    o1 = o1_ref[...] * _SQRT2
    o2 = o2_ref[...] * _SQRT2
    p = p_ref[...]
    s = (jnp.sqrt(1.0 + p) + jnp.sqrt(1.0 - p)) * 0.5
    t = (jnp.sqrt(1.0 + p) - jnp.sqrt(1.0 - p)) * 0.5

    zeros = jnp.zeros_like(u1)
    lam_ = jnp.asarray(lam, u1.dtype)
    eps_ = jnp.asarray(eps, u1.dtype)

    def body(k, acc):
        ei, z1, z2, sa, sm, sxy = acc
        xi = tab_ref[0, k]
        xj = tab_ref[1, k]
        wiwj = tab_ref[2, k]
        xixj = tab_ref[3, k]
        x2a = tab_ref[4, k]
        x2m = tab_ref[5, k]
        zi = s * xi + t * xj
        zj = t * xi + s * xj
        x1 = o1 * zi + u1
        x2 = o2 * zj + u2
        d = x1 - x2
        fv = wiwj * (-lam_ * jnp.sqrt(eps_ + d * d))
        return (
            ei + fv,
            z1 + fv * zi,
            z2 + fv * zj,
            sa + fv * (x2a - 1.0),
            sm + fv * x2m,
            sxy + fv * xixj,
        )

    ei, z1, z2, sa, sm, sxy = jax.lax.fori_loop(
        0, K2, body, (zeros, zeros, zeros, zeros, zeros, zeros)
    )
    ei_ref[...] = ei
    z1_ref[...] = z1
    z2_ref[...] = z2
    sa_ref[...] = sa
    sm_ref[...] = sm
    sxy_ref[...] = sxy


def edge_gq_pallas(
    u1, u2, o1, o2, p, K: int, lambdas: float, epsn: float,
    rows: int = 64, interpret: bool = False,
) -> GQRaw:
    """Fused edge quadrature over arrays of shape ``lead + (M, N)``.

    All inputs broadcast to a common shape; the kernel grids over
    (flattened lead, M/rows) tiles of (rows, N).
    """
    shape = jnp.broadcast_shapes(u1.shape, u2.shape, o1.shape, o2.shape, p.shape)
    dtype = u1.dtype
    args = [jnp.broadcast_to(a, shape).reshape((-1,) + shape[-2:]) for a in (u1, u2, o1, o2, p)]
    B, M, N = args[0].shape
    K2 = K * K
    tab = jnp.asarray(pack_table(K, dtype))

    rows = min(rows, M)
    while M % rows:
        rows -= 1
    grid = (B, M // rows)

    state_spec = pl.BlockSpec(
        (1, rows, N), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    out_shape = [jax.ShapeDtypeStruct((B, M, N), dtype)] * 6

    fn = pl.pallas_call(
        functools.partial(_kernel, K2=K2, lam=float(lambdas), eps=float(epsn)),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [state_spec] * 5,
        out_specs=[state_spec] * 6,
        out_shape=out_shape,
        interpret=interpret,
    )
    outs = fn(tab, *args)
    outs = [o.reshape(shape) for o in outs]
    return GQRaw(*outs)
