"""Tune the cosine mode-sum kernel's spill-pressure knobs on hardware.

Hypothesis (PERFORMANCE.md "honest distance" section): the 3.6x gap to the
issue-serial bound is register spilling of the 8 loop-carried accumulators —
each carry spans ~11 VREGs at the flagship tile (3, 8, 452), so the inner
v-degree loop spills/fills most of its carry state every iteration through
VMEM. Two knobs attack that:

* ``unroll_b`` — unroll the inner loop so carries spill at most once per
  ``unroll_b`` iterations (spill traffic / unroll_b);
* ``cols``     — lane-tile the N axis so each carry spans cols/128 VREGs
  and the whole carry set can stay resident in registers.

Times each (variant, cols, unroll_b) point with the roofline two-trip-count
in-loop differencing at the flagship workload, converged regime (where the
adaptive cutoff cannot help and the raw loop speed is the whole story).
Appends one JSON line to results/kernel_tune.jsonl.
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
                   "results", "kernel_tune.jsonl")


def bench_point(problem, state, a_block, variant, cols, unroll_b,
                rows=8, n1=4, n2=64):
    def kloop(ch, s, n):
        def body(i, acc):
            outs = cos_mode_sums_pallas(
                ch, s.muu + acc, s.muv, s.sigmau, s.sigmav, s.pn,
                a_block=a_block, rows=rows, variant=variant, cols=cols,
                unroll_b=unroll_b,
            )
            return outs[0].ravel()[0] * jnp.asarray(1e-30, s.muu.dtype)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), s.muu.dtype))

    return timed(kloop, problem.cheb, state, n1=n1, n2=n2)


def check_point(problem, state, a_block, variant, cols, unroll_b, ref,
                rows=8):
    outs = cos_mode_sums_pallas(
        problem.cheb, state.muu, state.muv, state.sigmau, state.sigmav,
        state.pn, a_block=a_block, rows=rows, variant=variant, cols=cols,
        unroll_b=unroll_b,
    )
    return max(float(jnp.max(jnp.abs(a - b))) /
               max(float(jnp.max(jnp.abs(a))), 1e-30)
               for a, b in zip(ref, outs))


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.jax_cache"))
    r = np.random.default_rng(0)
    points = [
        dict(variant="v1", cols=None, unroll_b=1),    # production baseline
        dict(variant="v1", cols=None, unroll_b=4),
        dict(variant="v1", cols=None, unroll_b=16),
        dict(variant="v1", cols=128, unroll_b=1),
        dict(variant="v1", cols=128, unroll_b=4),
        dict(variant="v1", cols=128, unroll_b=16),
        dict(variant="v1", cols=256, unroll_b=4),
    ]
    if len(sys.argv) > 1:   # e.g. "v1,128,8" or "adaptive,128,16,16,8" (+rows,+a_block)
        points = []
        for spec in sys.argv[1:]:
            f = spec.split(",")
            pt = dict(variant=f[0], cols=None if f[1] == "none" else int(f[1]),
                      unroll_b=int(f[2]))
            if len(f) > 3:
                pt["rows"] = int(f[3])
            if len(f) > 4:
                pt["a_block"] = int(f[4])
            points.append(pt)

    rows = []
    workloads = {
        "flagship_96x16": (96, 16, FlowRange(-10.0, 2.0, -2.0, 2.0)),
        "teddy_192x12": (192, 12, FlowRange(-53.0, 2.0, -2.0, 2.0)),
    }
    sel = os.environ.get("TUNE_WORKLOAD", "flagship_96x16")
    for label, (A, B, fr) in workloads.items():
        if sel not in (label, "all"):
            continue
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
        ref = cos_mode_sums_pallas(
            problem.cheb, conv.muu, conv.muv, conv.sigmau, conv.sigmav,
            conv.pn, a_block=cfg.cheb_ablock, variant="v1",
        )
        for pt in points:
            pt = dict(pt)  # per-workload copy: don't leak a resolved a_block
            t0 = time.time()
            ab = pt.pop("a_block", cfg.cheb_ablock)
            err = check_point(problem, conv, ab, ref=ref, **pt)
            t = bench_point(problem, conv, ab, **pt)
            pt["a_block"] = ab
            rows.append(dict(workload=label, regime="converged", **pt,
                             ms=round(t * 1e3, 3), rel_err=err,
                             wall_s=round(time.time() - t0, 1)))
            print(rows[-1], flush=True)
    rec = dict(rows=rows, device=str(jax.devices()[0]),
               ts=time.strftime("%Y-%m-%dT%H:%M:%S"))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
