"""A/B the Pallas cosine-kernel variants on hardware (v1 vs v2 vs v2_fixed).

Each variant is timed with the roofline module's two-trip-count in-loop
differencing (the only trustworthy method on the tunneled runtime), at the
flagship workload and the Teddy-campaign workload, in two sigma regimes:

* ``wide``      — sigma at its init scale (range/4): the regime of the
                  first ~1-2k sweeps, where v2's adaptive u-degree cutoff
                  should skip most coefficient blocks;
* ``converged`` — sigma near sigma_min for most sites (mixed tiles): the
                  late-run regime where the cutoff cannot engage and only
                  the exp-lite arithmetic differs.

Appends one JSON line per invocation to results/kernel_ab.jsonl.
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
from gqmap_tpu.kernels.cosine_gq import cos_mode_sums_pallas
from gqmap_tpu.kernels.roofline import timed
from gqmap_tpu.models.gqmap import init_state, make_problem

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "kernel_ab.jsonl")


def bench_variant(problem, state, a_block, variant, n1=4, n2=34):
    # a_block=None → the kernel's tuned empirical default, a_block=min(A, 24)
    def kloop(ch, s, n):
        def body(i, acc):
            outs = cos_mode_sums_pallas(
                ch, s.muu + acc, s.muv, s.sigmau, s.sigmav, s.pn,
                a_block=a_block, variant=variant,
            )
            return outs[0].ravel()[0] * jnp.asarray(1e-30, s.muu.dtype)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), s.muu.dtype))

    return timed(kloop, problem.cheb, state, n1=n1, n2=n2)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.jax_cache"))
    r = np.random.default_rng(0)
    rows = []
    for label, (A, B, fr) in {
        "flagship_96x16": (96, 16, FlowRange(-10.0, 2.0, -2.0, 2.0)),
        "teddy_192x12": (192, 12, FlowRange(-53.0, 2.0, -2.0, 2.0)),
    }.items():
        M, N = 376, 452
        I1 = r.uniform(0, 255, (M, N))
        I2 = np.roll(I1, 1, axis=1)
        cfg = GQMAPConfig.tpu_fast(dtype="float32", cheb_p=A, cheb_q=B)
        problem = make_problem(cfg, I1, I2, fr)
        wide = init_state(cfg, fr, I1.shape)
        conv = wide._replace(
            sigmau=jnp.full_like(wide.sigmau, 0.05),
            sigmav=jnp.full_like(wide.sigmav, 0.05),
        )
        for regime, state in (("wide", wide), ("converged", conv)):
            for variant in ("v1", "adaptive", "recur"):
                t = bench_variant(problem, state, None, variant)
                rows.append(dict(workload=label, regime=regime,
                                 variant=variant, ms=round(t * 1e3, 3)))
                print(rows[-1], flush=True)
    rec = dict(rows=rows, device=str(jax.devices()[0]),
               ts=time.strftime("%Y-%m-%dT%H:%M:%S"))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
