"""MRF potential functions for the dense-correspondence model.

Node (data) potential: Charbonnier-robust brightness constancy against a
bicubically sampled second frame (``gqmap_gpu_mixture.m:156-179``). Edge
(smoothness) potential: Charbonnier on the neighbor flow difference
(``:180-182``). The "Super" variant sums the node potential over a PxP patch
of image pixels per flow node (``gqmap_gpuSuper_mix_entropy.m:94-105``).

Layout convention (TPU-native): the lattice axes (M, N) are the TRAILING
two axes of every array; quadrature-chunk / mixture-component / edge axes
lead. Trailing small axes would be padded to the (8, 128) native tile.

Legacy potential families are kept as first-class options so the framework
subsumes the whole solver lineage:

* ``make_node_pot_nearest`` — nearest lookup into a 2^rfc-x cubic-upsampled
  frame (``legacy/gqmap_gpuV2.m:10,107``, ``legacy/gqmap_ctf.m:10,96``).
* quadratic node toward an init flow + truncated-quadratic edges
  (``legacy/gqmap_cpu.m:22-23,43``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .interp import sample_bicubic

__all__ = [
    "make_node_pot_bicubic",
    "make_node_pot_nearest",
    "make_node_pot_quadratic",
    "make_edge_pot",
    "make_edge_pot_diff",
    "make_edge_pot_truncquad",
    "make_edge_pot_truncquad_diff",
]


def make_node_pot_bicubic(
    I1: jnp.ndarray,
    VV: jnp.ndarray,
    lambdad: float,
    epsn: float,
    patch: int = 1,
    origin=None,
    local_image_shape=None,
) -> Callable:
    """Return ``f(x1, x2) -> node potential`` over the flow lattice.

    ``I1`` is the (Mo, No) first frame; ``VV = pad_cubic(I2)``. The returned
    callable accepts displacement sample arrays of shape
    ``lead + (M, N)`` where ``(M, N) = (Mo, No) / patch`` and ``lead`` is
    any number of leading broadcast axes (quadrature chunk, mixture
    components, ...). For ``patch > 1`` each flow node sums the data
    potential over its ``patch x patch`` pixel block (super lattice).
    """
    Mo, No = I1.shape
    dtype = I1.dtype
    lam = jnp.asarray(lambdad, dtype)
    eps = jnp.asarray(epsn, dtype)
    # Distributed (shard_map) use: `origin` = traced (row0, col0) image-pixel
    # offset of this shard and `local_image_shape` its owned extent; frame 1
    # is then sliced locally while the padded frame 2 stays global (bounded-
    # range bicubic gathers may touch an arbitrary window).
    Ml, Nl = local_image_shape if local_image_shape is not None else (Mo, No)

    def f(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
        # 1-based coordinate grids as iota ops (NOT trace-time constants:
        # embedded array constants are pathologically slow on some runtimes)
        jj = 1.0 + jax.lax.broadcasted_iota(dtype, (1, Nl), 1)
        ii = 1.0 + jax.lax.broadcasted_iota(dtype, (Ml, 1), 0)
        I1l = I1
        if origin is not None:
            r0, c0 = origin
            jj = jj + c0.astype(dtype)
            ii = ii + r0.astype(dtype)
            I1l = jax.lax.dynamic_slice(I1, (r0, c0), (Ml, Nl))
        if patch > 1:
            x1 = jnp.repeat(jnp.repeat(x1, patch, axis=-2), patch, axis=-1)
            x2 = jnp.repeat(jnp.repeat(x2, patch, axis=-2), patch, axis=-1)
        Xq = jj + x1  # sample_bicubic clamps to [1, No] (gqmap_gpu_mixture.m:157)
        Yq = ii + x2
        Vq = sample_bicubic(VV, Xq, Yq)
        npt = -lam * jnp.sqrt(eps + (I1l - Vq) ** 2)
        if patch > 1:
            M, N = Ml // patch, Nl // patch
            lead = npt.shape[:-2]
            npt = npt.reshape(lead + (M, patch, N, patch)).sum(axis=(-3, -1))
        return npt

    return f


def make_node_pot_nearest(
    I1: jnp.ndarray,
    I2_cont: jnp.ndarray,
    lambdad: float,
    epsn: float,
    rfc: int,
    origin=None,
    local_image_shape=None,
) -> Callable:
    """Legacy data term: nearest lookup into the 2^rfc-x upsampled frame.

    ``I2_cont = upsample_cubic(I2, rfc)``; lookup index
    ``round((pos - 1) * 2^rfc + 1)`` clamped to the fine grid
    (``legacy/gqmap_ctf.m:96``). MATLAB ``round`` is half-away-from-zero;
    positions are >= ~1 so ``floor(x + 0.5)`` reproduces it.
    """
    Mo, No = I1.shape
    MM, NN = I2_cont.shape
    dtype = I1.dtype
    lam = jnp.asarray(lambdad, dtype)
    eps = jnp.asarray(epsn, dtype)
    r = float(1 << rfc)
    flat = I2_cont.reshape(-1)
    Ml, Nl = local_image_shape if local_image_shape is not None else (Mo, No)

    def f(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
        jj = 1.0 + jax.lax.broadcasted_iota(dtype, (1, Nl), 1)
        ii = 1.0 + jax.lax.broadcasted_iota(dtype, (Ml, 1), 0)
        I1l = I1
        if origin is not None:
            r0, c0 = origin
            jj = jj + c0.astype(dtype)
            ii = ii + r0.astype(dtype)
            I1l = jax.lax.dynamic_slice(I1, (r0, c0), (Ml, Nl))
        ci = jnp.clip(jnp.floor((ii + x2 - 1.0) * r + 1.5), 1, MM).astype(jnp.int32) - 1
        cj = jnp.clip(jnp.floor((jj + x1 - 1.0) * r + 1.5), 1, NN).astype(jnp.int32) - 1
        Vq = jnp.take(flat, ci * NN + cj)
        return -lam * jnp.sqrt(eps + (I1l - Vq) ** 2)

    return f


def make_edge_pot(lambdas: float, epsn: float) -> Callable:
    """Charbonnier smoothness: ``-lambdas * sqrt(epsn + (x1-x2)^2)``."""

    def f(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
        lam = jnp.asarray(lambdas, x1.dtype)
        eps = jnp.asarray(epsn, x1.dtype)
        return -lam * jnp.sqrt(eps + (x1 - x2) ** 2)

    return f


def make_edge_pot_diff(lambdas: float, epsn: float) -> Callable:
    """Difference form of the Charbonnier edge potential: ``gd(d) = f(d, 0)``.

    Both reference edge families depend only on ``x1 - x2``; this form feeds
    the 1-D reduced quadrature (:func:`gqmap_tpu.ops.gq.gq_accumulate_diff`).
    """

    def gd(d: jnp.ndarray) -> jnp.ndarray:
        lam = jnp.asarray(lambdas, d.dtype)
        eps = jnp.asarray(epsn, d.dtype)
        return -lam * jnp.sqrt(eps + d * d)

    return gd


def make_edge_pot_truncquad(gama: float, dta: float) -> Callable:
    """Truncated-quadratic edge potential (``legacy/gqmap_cpu.m:42-44``).

    ``-(x1-x2)^2 / (2*gama)`` with differences beyond ``dta`` truncated
    (zero beyond the cutoff, making the potential robust to discontinuities).
    """

    def f(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
        d = x2 - x1
        d = jnp.where(jnp.abs(d) > dta, jnp.zeros_like(d), d)
        return -(d * d) / (2.0 * jnp.asarray(gama, x1.dtype))

    return f


def make_edge_pot_truncquad_diff(gama: float, dta: float) -> Callable:
    """Difference form of the truncated-quadratic edge potential."""

    def gd(d: jnp.ndarray) -> jnp.ndarray:
        d = jnp.where(jnp.abs(d) > dta, jnp.zeros_like(d), d)
        return -(d * d) / (2.0 * jnp.asarray(gama, d.dtype))

    return gd


def make_node_pot_quadratic(init_flow, var: float):
    """Quadratic node potential toward a given init flow
    (``legacy/gqmap_cpu.m:22-23``): ``-((fu-x1)^2 + (fv-x2)^2)/(2 var)``.

    The earliest solver family treats the data term as a prior around an
    externally supplied flow (e.g. the block-matching initializer); the
    joint (x1, x2) form with node correlation subsumes the reference's
    per-channel 1-D version.
    """
    fu = init_flow[..., 0]
    fv = init_flow[..., 1]

    def f(x1, x2):
        inv = 1.0 / (2.0 * var)
        du = fu - x1
        dv = fv - x2
        return -(du * du + dv * dv) * inv

    return f
