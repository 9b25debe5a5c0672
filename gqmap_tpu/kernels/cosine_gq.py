"""Pallas TPU kernel: fused cosine-spectral node term (mode sums in VMEM).

The XLA lowering of :func:`gqmap_tpu.ops.cosine._mode_sums` runs at a few
hundred Gflop/s: the unrolled (a, b) mode loop produces thousands of small
(L, M, N) elementwise ops whose intermediates spill to HBM between fusions
(measured in ``scripts/cosine_variants.py`` — the cost is the six gradient
accumulators, not the transcendentals). This kernel runs the whole mode
loop per lattice tile inside VMEM: the per-pixel coefficient field streams
in once (grid over u-degree blocks, outputs accumulated across the inner
grid axis), every intermediate lives in vector registers, and the six mode
sums are written exactly once per tile.

Math identical to :mod:`gqmap_tpu.ops.cosine` (characteristic-function
closed form of ``E[cos(a th1(x1)) cos(b th2(x2))]`` with the stable
exponent split); reference semantics per ``gqmap_gpu_mixture.m:87-116``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cos_mode_sums_pallas", "cos_node_grads_pallas"]

# Kernel variant used when callers don't ask for one explicitly. "v1" =
# original fixed-trip two-exp body; "adaptive" = same body with the
# tile-wide u-degree cutoff (measured on v5e, results/kernel_ab.jsonl:
# identical converged-regime speed, 3.4-6.7x faster while sigma is wide);
# "recur" = adaptive + a zero-exp multiplicative-recurrence inner body
# taken whenever a per-tile exponent bound proves it safe — which is
# exactly the tight-sigma converged regime that dominates a 30000-sweep
# run (r04, results/kernel_ab.jsonl last record: 5.881 vs 6.113 ms
# flagship converged, 9.01 vs 9.337 ms Teddy — a measured ~4% win, the
# issue-serial pipeline hides most of the removed exp work). The exp-lite
# "v2" experiment (one exp per mode, recurrence for the cross factor
# only) recorded in kernel_ab.jsonl LOST ~20% and was removed; "recur"
# differs by removing ALL in-loop exps and only where the recurrence
# cannot underflow-then-recover (see _kernel's safety predicate).
_DEFAULT_VARIANT = "recur"


def _tile_stats(s1, s2, M, rows, N, cols, total_sites):
    """Masked per-tile (s1_min, s1_max, s2_max) over the VALID lanes.

    Ragged final row/col tiles carry out-of-bounds garbage lanes — masked
    out of the min/max, or the adaptive cutoff could drop REAL modes (and
    the recurrence-safety bound could be poisoned by junk). With
    ``total_sites`` set the lattice is the FLAT site layout (row-major
    (M*N,) packed into (Mf, Nf) 128-multiple lanes): validity is then a
    bound on the flat index, since all padding sits at the tail.
    """
    dtype = s1.dtype
    rows_idx = (
        jax.lax.broadcasted_iota(jnp.int32, s1.shape, 1)
        + pl.program_id(0) * rows
    )
    cols_idx = jax.lax.broadcasted_iota(jnp.int32, s1.shape, 2)
    if cols != N:
        cols_idx = cols_idx + pl.program_id(1) * cols
    if total_sites is not None:
        valid = rows_idx * N + cols_idx < total_sites
    else:
        valid = rows_idx < M
        if cols != N:
            valid &= cols_idx < N
    s1_min = jnp.min(jnp.where(valid, s1, jnp.asarray(jnp.inf, dtype)))
    s1_max = jnp.max(jnp.where(valid, s1, jnp.asarray(0.0, dtype)))
    s2_max = jnp.max(jnp.where(valid, s2, jnp.asarray(0.0, dtype)))
    return s1_min, s1_max, s2_max


def _adaptive_trip(s1_min, s2_max, a0, a_block, B):
    """Tile-wide outer-loop trip count for the adaptive u-degree cutoff.

    Every mode weight obeys ``W± <= exp(-0.5 (a s1 - b s2)^2)`` (the cross
    factor ``exp(-a b g±)`` is <= 1 since g± = s1 s2 (1 ∓ p) >= 0), so once
    ``a s1 > (B-1) s2 + theta`` every remaining (a, b) term of the tile is
    below ``e^{-theta^2/2}``; theta = 10 leaves a < e^-50 tail, invisible
    even against the a²-weighted gradient sums.
    """
    dtype = s1_min.dtype
    theta = jnp.asarray(10.0, dtype)
    a_cut = ((B - 1.0) * s2_max + theta) / jnp.maximum(
        s1_min, jnp.asarray(1e-20, dtype)
    )
    return jnp.clip(jnp.ceil(a_cut).astype(jnp.int32) + 1 - a0, 0, a_block)


def _kernel(sp_ref, c_ref, out_ref,
            *, a_block: int, B: int, variant: str, M: int, rows: int,
            N: int, cols: int, unroll_b: int, total_sites: int | None):
    dtype = sp_ref.dtype
    # With lane tiling the u-degree grid axis moves from 1 to 2.
    ia_axis = 1 if cols == N else 2

    # Phases/scales are precomputed outside (ph = k*(mu - lo), s = k*sigma)
    # so the kernel needs no scalar box bounds — CosData stays a traceable
    # jit argument (closing over the ~GB coefficient field is not an option
    # on the remote-compile runtime). The five per-site inputs arrive as
    # ONE stacked (5, L, rows, cols) block and the six sums leave as ONE
    # (6, L, rows, cols) block: separate arrays cost ~11 unfused pad/
    # reshape/slice HLOs per call in the flat layout (~0.4 ms/sweep, which
    # erased the wide-regime rate — r04 measurement), stacked it is two.
    ph1 = sp_ref[0]
    ph2 = sp_ref[1]
    s1 = sp_ref[2]
    s2 = sp_ref[3]
    p = sp_ref[4]

    gm = s1 * s2 * (1.0 - p)
    gp = s1 * s2 * (1.0 + p)
    c1, sn1 = jnp.cos(ph1), jnp.sin(ph1)
    c2, sn2 = jnp.cos(ph2), jnp.sin(ph2)

    ia = pl.program_id(ia_axis)
    a0 = ia * a_block
    a0f = a0.astype(dtype)
    ca, sa = jnp.cos(a0f * ph1), jnp.sin(a0f * ph1)

    if variant == "v1":
        trip = a_block
    else:
        s1_min, s1_max, s2_max = _tile_stats(
            s1, s2, M, rows, N, cols, total_sites
        )
        trip = _adaptive_trip(s1_min, s2_max, a0, a_block, B)

    zeros = jnp.zeros_like(ph1)
    ones = jnp.ones_like(ph1)

    # Loops stay lax.fori_loop (NOT python-unrolled): the remote Mosaic
    # compile scales with program size, and a_block*B unrolled mode bodies
    # take minutes to build for no measurable runtime gain — the body is
    # uniform vector work far above loop overhead.
    def a_body(j, carry):
        ca, sa, E0, A1, A2, Aa, Ab, Ax = carry
        af = a0f + j.astype(dtype)
        as1 = af * s1
        agm = af * gm
        agp = af * gp

        def b_body(b, c):
            cb, sb, m, sE, sEb, sP, sPm, sXb = c
            bf = b.astype(dtype)
            h = -0.5 * (m * m)
            Wm = jnp.exp(h - bf * agm)
            Wp = jnp.exp(h - bf * agp)
            t1 = ca * cb
            t2 = sa * sb
            t3 = sa * cb
            t4 = ca * sb
            cab = c_ref[0, j, b]
            cWm = cab * Wm
            cWp = cab * Wp
            cU = cWm * (t1 + t2)
            cV = cWp * (t1 - t2)
            cP = cWm * (t3 - t4)
            cQ = cWp * (t3 + t4)
            uv = cU + cV
            return (
                cb * c2 - sb * sn2,
                sb * c2 + cb * sn2,
                m - s2,
                sE + uv,
                sEb + (bf * bf) * uv,
                sP + (cP + cQ),
                sPm + bf * (cP - cQ),
                sXb + bf * (cU - cV),
            )

        init = (ones, zeros, as1, zeros, zeros, zeros, zeros, zeros)
        if unroll_b <= 1:
            _, _, _, sE, sEb, sP, sPm, sXb = jax.lax.fori_loop(
                0, B, b_body, init
            )
        elif unroll_b >= B:
            # Mosaic's fori lowering only accepts unroll=1 or =num_steps.
            _, _, _, sE, sEb, sP, sPm, sXb = jax.lax.fori_loop(
                0, B, b_body, init, unroll=B
            )
        else:
            # Partial unroll by hand: carries cross the fori boundary (and
            # thus may spill) only once per unroll_b iterations.
            if B % unroll_b:
                raise ValueError("unroll_b must divide B")

            def chunk(jc, c):
                b0 = jc * unroll_b
                for k in range(unroll_b):
                    c = b_body(b0 + k, c)
                return c

            _, _, _, sE, sEb, sP, sPm, sXb = jax.lax.fori_loop(
                0, B // unroll_b, chunk, init
            )
        return (
            ca * c1 - sa * sn1,
            sa * c1 + ca * sn1,
            E0 + sE,
            A1 + af * sP,
            A2 + sPm,
            Aa + (af * af) * sE,
            Ab + sEb,
            Ax + af * sXb,
        )

    init = (ca, sa, zeros, zeros, zeros, zeros, zeros, zeros)

    if variant == "recur":
        # Zero-exp inner body: Wm(b) and Wp(b) evolve by the exact
        # multiplicative recurrences
        #   Wm(b+1) = Wm(b) * fm(b),  fm(b+1) = fm(b) * r,
        #   fm(0) = exp(a s1 s2 p - s2^2/2),  r = exp(-s2^2)
        # (and fp(0) with the sign of p flipped), derived from
        #   h(b+1) - h(b) - a gm = a s1 s2 p - s2^2 (b + 1/2).
        # Three exps per (a, tile-site) instead of two per (a, b,
        # tile-site). The recurrence is ONLY numerically valid when no
        # intermediate weight underflows and later recovers (Wm(0) =
        # exp(-(a s1)^2/2) dies at a s1 > ~13 while Wm(b ~ a s1/s2) can be
        # O(1) — exactly the wide-sigma + correlated case the stable
        # exponent split exists for, ops/cosine.py). Tile-wide bound:
        # every exponent magnitude along the path is < (a_max s1_max +
        # B s2_max)^2, so require that < 8.9 (=> e^|79| stays finite and
        # no f32 weight underflows by more than e^-79 before recovering) —
        # satisfied with ~20x margin in the converged regime, where this
        # branch measures ~4% faster than the exp body (r04,
        # results/kernel_ab.jsonl: 5.881 vs 6.113 ms flagship converged).
        spp = s1 * s2 * p
        hs2 = 0.5 * (s2 * s2)
        rr = jnp.exp(-(s2 * s2))

        def a_body_recur(j, carry):
            ca, sa, E0, A1, A2, Aa, Ab, Ax = carry
            af = a0f + j.astype(dtype)
            as1 = af * s1
            wm = jnp.exp(-0.5 * (as1 * as1))
            arg = af * spp
            fm = jnp.exp(arg - hs2)
            fp = jnp.exp(-arg - hs2)
            wp = wm
            cb, sb = ones, zeros
            sE = sEb = sP = sPm = sXb = zeros
            for b in range(B):
                bf = float(b)
                cab = c_ref[0, j, b]
                apl = cab * (wm + wp)
                ami = cab * (wm - wp)
                t1 = ca * cb
                t2 = sa * sb
                t3 = sa * cb
                t4 = ca * sb
                Et = t1 * apl + t2 * ami   # c (U + V)
                Xt = t1 * ami + t2 * apl   # c (U - V)
                Pt = t3 * apl - t4 * ami   # c (P + Q)
                Mt = t3 * ami - t4 * apl   # c (P - Q)
                sE = sE + Et
                sEb = sEb + (bf * bf) * Et
                sP = sP + Pt
                sPm = sPm + bf * Mt
                sXb = sXb + bf * Xt
                wm = wm * fm
                fm = fm * rr
                wp = wp * fp
                fp = fp * rr
                cb, sb = cb * c2 - sb * sn2, sb * c2 + cb * sn2
            return (
                ca * c1 - sa * sn1,
                sa * c1 + ca * sn1,
                E0 + sE,
                A1 + af * sP,
                A2 + sPm,
                Aa + (af * af) * sE,
                Ab + sEb,
                Ax + af * sXb,
            )

        a_hi = a0f + trip.astype(dtype)
        safe = a_hi * s1_max + B * s2_max < 8.9
        _, _, E0, A1, A2, Aa, Ab, Ax = jax.lax.cond(
            safe,
            lambda: jax.lax.fori_loop(0, trip, a_body_recur, init),
            lambda: jax.lax.fori_loop(0, trip, a_body, init),
        )
    else:
        _, _, E0, A1, A2, Aa, Ab, Ax = jax.lax.fori_loop(0, trip, a_body, init)

    sums = (E0, A1, A2, Aa, Ab, Ax)

    @pl.when(ia == 0)
    def _init():
        for k, v in enumerate(sums):
            out_ref[k] = v

    @pl.when(ia != 0)
    def _acc():
        for k, v in enumerate(sums):
            out_ref[k] += v


def cos_mode_sums_pallas(
    cos, u1, u2, o1, o2, p,
    a_block: int | None = None, rows: int = 8, interpret: bool = False,
    variant: str | None = None,
    cols: int | str | None = "auto", unroll_b: int | None = None,
):
    """Six cosine mode sums over ``(L, M, N)`` state (see ops/cosine.py).

    Grid: ``(M/rows[, N/cols], A/a_block)`` — the u-degree axis is innermost
    so each lattice tile's six output blocks accumulate in VMEM across
    coefficient blocks (one coefficient DMA stream, one output write per
    tile).

    ``variant``: ``"v1"`` (fixed trip count), ``"adaptive"`` (tile-wide
    u-degree cutoff, :func:`_adaptive_trip`), or None for the module
    default ``_DEFAULT_VARIANT``.

    The loop body's 8 loop-carried accumulators span ceil(L*rows*cols/1024)
    VREGs each; at the full-row tile they overflow the VPU register file
    and spill through VMEM every iteration (measured 2.8-3.2x slowdown,
    results/kernel_tune.jsonl). Defaults are the tuned spill-free shape:

    * ``cols="auto"`` — lane-tile the N axis at 128 so each carry spans
      L VREGs (explicit int must be a multiple of 128; None = full axis);
    * ``unroll_b=None`` — fully unroll the inner v-degree loop so carries
      never cross a loop-backedge inside a tile row (int: partial unroll,
      must divide B; Mosaic only honours full fori unrolling natively);
    * ``a_block=None`` — the tuned uniform sweet spot (24; see the auto
      rule below for the measured rationale).
    """
    coeffs = cos.coeffs
    variant = _DEFAULT_VARIANT if variant is None else variant
    A, B = coeffs.shape[:2]
    L, M, N = jnp.broadcast_shapes(u1.shape, u2.shape, o1.shape, o2.shape, p.shape)
    dtype = u1.dtype

    ku = jnp.asarray(math.pi, dtype) / (cos.hi_u - cos.lo_u)
    kv = jnp.asarray(math.pi, dtype) / (cos.hi_v - cos.lo_v)
    ph1 = ku * (u1 - cos.lo_u)
    ph2 = kv * (u2 - cos.lo_v)
    s1 = ku * o1
    s2 = kv * o2
    sp = jnp.stack([jnp.broadcast_to(x, (L, M, N))
                    for x in (ph1, ph2, s1, s2, p)])

    # FLAT site layout: when the coefficient field was built with
    # build_cos_data(flat=True) its trailing axes are (Mf, Nf) — the
    # row-major (M*N,) site vector packed into 128-multiple lanes with the
    # padding at the tail. A ragged lattice like 452 lanes otherwise pads
    # to 512 in every tile (~13% dead work); repacking costs one O(state)
    # reshape per call (~10 us) against a per-MODE saving. Zero-fill is
    # safe: pad coefficients are zero, and validity masking in _tile_stats
    # keeps pad lanes out of the cutoff/safety reductions.
    total_sites = None
    lattice = (M, N)
    if coeffs.shape[2:] != (M, N):
        Mf, Nf = coeffs.shape[2:]
        S = M * N
        if Mf * Nf < S:
            raise ValueError(
                f"flat coefficient field {coeffs.shape} too small for the "
                f"({M}, {N}) lattice"
            )
        total_sites = S
        sp = jnp.pad(
            sp.reshape(5, L, S), ((0, 0), (0, 0), (0, Mf * Nf - S))
        ).reshape(5, L, Mf, Nf)
        M, N = Mf, Nf

    # Mosaic wants the sublane block dim divisible by 8 (or the full axis);
    # a ragged final row-block is fine — Pallas masks out-of-bounds writes.
    rows = min(rows, M)
    if M % rows and rows % 8:
        rows = min(8, M) if M >= 8 else M
    if cols == "auto":
        cols = 128 if N > 128 else None
    if cols is None:
        cols = N
    else:
        if cols < 128:
            raise ValueError("cols must be a positive multiple of 128 (or None)")
        cols = min(cols, N)
    if cols != N and cols % 128:
        raise ValueError("cols must be a multiple of 128 (or the full axis)")
    if a_block is None:
        # Tuned on v5e (results/kernel_tune.jsonl): 24 is within 4% of the
        # per-shape best on both flagship (96x16) and campaign (192x12)
        # shapes; larger blocks hit a >1.5x cliff at 192x12 (a_block=40)
        # while staying flat at 96x16 — no clean VMEM-bytes rule fits both,
        # so use the uniform empirical sweet spot — but ONLY when it
        # divides A. A ragged final A-block is catastrophic, not the
        # ~pad/A work it looks like: at 64x16, a_block=24 (pad 64->72,
        # nA=3) measures 6.75-6.88 ms vs 3.90-4.05 at the evenly-dividing
        # a_block=32 (results/diag_64x16.jsonl, r05) — a ~70% penalty on
        # a tile that adds only 12.5% of padded modes. So: take the
        # largest block <= 32 that divides A exactly, preferring 24 when
        # it divides (the tuned spot for 48/96/192-class degrees); fall
        # back to the raw minimum only for degenerate A with no such
        # divisor.
        if A <= 24:
            a_block = A
        elif A % 24 == 0:
            a_block = 24
        else:
            a_block = next((d for d in range(32, 7, -1) if A % d == 0),
                           min(A, 24))
    if unroll_b is None:
        unroll_b = B
    nA = -(-A // a_block)
    if nA * a_block != A:
        coeffs = jnp.pad(coeffs, ((0, nA * a_block - A), (0, 0), (0, 0), (0, 0)))
    cblocks = coeffs.reshape(nA, a_block, B, M, N)
    if cols == N:
        grid = (-(-M // rows), nA)
        state_spec = pl.BlockSpec(
            (5, L, rows, N), lambda im, ia: (0, 0, im, 0),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (6, L, rows, N), lambda im, ia: (0, 0, im, 0),
            memory_space=pltpu.VMEM,
        )
        coeff_spec = pl.BlockSpec(
            (1, a_block, B, rows, N), lambda im, ia: (ia, 0, 0, im, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        grid = (-(-M // rows), -(-N // cols), nA)
        state_spec = pl.BlockSpec(
            (5, L, rows, cols), lambda im, ic, ia: (0, 0, im, ic),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (6, L, rows, cols), lambda im, ic, ia: (0, 0, im, ic),
            memory_space=pltpu.VMEM,
        )
        coeff_spec = pl.BlockSpec(
            (1, a_block, B, rows, cols), lambda im, ic, ia: (ia, 0, 0, im, ic),
            memory_space=pltpu.VMEM,
        )
    out_shape = jax.ShapeDtypeStruct((6, L, M, N), dtype)

    if variant not in ("v1", "adaptive", "recur"):
        raise ValueError(f"unknown cosine kernel variant {variant!r}")
    body = functools.partial(_kernel, a_block=a_block, B=B,
                             variant=variant, M=M, rows=rows,
                             N=N, cols=cols, unroll_b=unroll_b,
                             total_sites=total_sites)
    fn = pl.pallas_call(
        body,
        grid=grid,
        in_specs=[state_spec, coeff_spec],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )
    outs = fn(sp, cblocks)
    if total_sites is not None:
        Ml, Nl = lattice
        outs = outs.reshape(6, L, M * N)[..., :total_sites].reshape(
            6, L, Ml, Nl
        )
    return tuple(outs[k] for k in range(6))


def cos_node_grads_pallas(
    cos, u1, u2, o1, o2, p, a, T, entropy_scale: float,
    a_block: int | None = None, rows: int = 8, interpret: bool = False,
    variant: str | None = None,
    cols: int | str | None = "auto", unroll_b: int | None = None,
):
    """Drop-in Pallas replacement for :func:`gqmap_tpu.ops.cosine.cos_node_grads`."""
    from ..ops.cosine import _finalize_mode_sums

    E0, A1, A2, Aa, Ab, Ax = cos_mode_sums_pallas(
        cos, u1, u2, o1, o2, p, a_block=a_block, rows=rows, interpret=interpret,
        variant=variant, cols=cols, unroll_b=unroll_b,
    )
    return _finalize_mode_sums(
        cos, (E0, A1, A2, Aa, Ab, Ax), u1, o1, o2, p, a, T, entropy_scale
    )
