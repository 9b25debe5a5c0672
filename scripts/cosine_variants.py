"""Timing experiments on the cosine-term inner loop (TPU).

Variants: full grads / E-only / exp-replaced-by-mult (wrong values, isolates
transcendental cost) / no-trig (isolates rotation cost).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gqmap_tpu.config import GQMAPConfig
from gqmap_tpu.models.gqmap import init_state, make_problem


def timeit(fn, *args, reps=6):
    out = fn(*args)
    s = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(s))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    s = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(s))
    return (time.time() - t0) / reps


def mode_loop(cos, u1, u2, o1, o2, p, a_block=8, *, grads=True, fake_exp=False,
              fake_trig=False):
    import math
    coeffs = cos.coeffs
    A, B = coeffs.shape[:2]
    dtype = u1.dtype
    ku = jnp.asarray(math.pi, dtype) / (cos.hi_u - cos.lo_u)
    kv = jnp.asarray(math.pi, dtype) / (cos.hi_v - cos.lo_v)
    ph1 = ku * (u1 - cos.lo_u)
    ph2 = kv * (u2 - cos.lo_v)
    s1 = ku * o1
    s2 = kv * o2
    gm = s1 * s2 * (1.0 - p)
    gp = s1 * s2 * (1.0 + p)
    c1, sn1 = jnp.cos(ph1), jnp.sin(ph1)
    c2, sn2 = jnp.cos(ph2), jnp.sin(ph2)
    site = jnp.broadcast_shapes(u1.shape, u2.shape, o1.shape, o2.shape, p.shape)
    zeros = jnp.zeros(site, dtype)
    ones = jnp.ones(site, dtype)
    nblocks = (A + a_block - 1) // a_block
    cblocks = coeffs.reshape(nblocks, a_block, B, *coeffs.shape[2:])
    n_sums = 6 if grads else 1

    def body(carry, cblk):
        ca, sa, a0, sums = carry
        for j in range(a_block):
            a = a0 + j
            af = a.astype(dtype)
            as1 = af * s1
            agm = af * gm
            agp = af * gp
            cb, sb = ones, zeros
            for b in range(B):
                bf = jnp.asarray(float(b), dtype)
                m = as1 - bf * s2
                h = -0.5 * (m * m)
                if fake_exp:
                    Wm = h * (1.0 - bf * agm)
                    Wp = h * (1.0 - bf * agp)
                else:
                    Wm = jnp.exp(h - bf * agm)
                    Wp = jnp.exp(h - bf * agp)
                cacb = ca * cb
                sasb = sa * sb
                U = Wm * (cacb + sasb)
                V = Wp * (cacb - sasb)
                cab = cblk[j, b]
                if grads:
                    sacb = sa * cb
                    casb = ca * sb
                    Pt = Wm * (sacb - casb)
                    Qt = Wp * (sacb + casb)
                    E0, A1, A2, Aa, Ab, Ax = sums
                    UV = cab * (U + V)
                    sums = (E0 + UV, A1 + (af * cab) * (Pt + Qt),
                            A2 + (bf * cab) * (Pt - Qt), Aa + (af * af) * UV,
                            Ab + (bf * bf) * UV, Ax + (af * bf * cab) * (U - V))
                else:
                    (E0,) = sums
                    sums = (E0 + cab * (U + V),)
                if not fake_trig:
                    cb, sb = cb * c2 - sb * sn2, sb * c2 + cb * sn2
            ca, sa = ca * c1 - sa * sn1, sa * c1 + ca * sn1
        return (ca, sa, a0 + a_block, sums), None

    init = (ones, zeros, jnp.asarray(0, jnp.int32), (zeros,) * n_sums)
    (_, _, _, sums), _ = jax.lax.scan(body, init, cblocks)
    return sums


def main():
    from bench import load_problem_images

    I1, I2, fr = load_problem_images()
    cfg = GQMAPConfig.tpu_fast(dtype="float32", data_term="cosine")
    problem = make_problem(cfg, I1, I2, fr)
    state = init_state(cfg, fr, I1.shape)
    args = (problem.cheb, state.muu, state.muv, state.sigmau, state.sigmav, state.pn)

    for name, kw in [
        ("full grads        ", dict(grads=True)),
        ("E only            ", dict(grads=False)),
        ("fake exp (no exp) ", dict(grads=True, fake_exp=True)),
        ("fake trig         ", dict(grads=True, fake_trig=True)),
        ("fake both         ", dict(grads=True, fake_exp=True, fake_trig=True)),
        ("ablock=4          ", dict(grads=True, a_block=4)),
        ("ablock=16         ", dict(grads=True, a_block=16)),
        ("ablock=32         ", dict(grads=True, a_block=32)),
    ]:
        kw2 = dict(kw)
        ab = kw2.pop("a_block", 8)

        def fn(cos, *a, _ab=ab, _kw2=tuple(sorted(kw2.items()))):
            return mode_loop(cos, *a, a_block=_ab, **dict(_kw2))

        t = timeit(jax.jit(fn), *args)
        print(f"{name}: {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
