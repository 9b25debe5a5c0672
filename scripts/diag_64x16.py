"""Diagnose the r05 64x16 sweep regression.

roofline_r05.json measured the isolated v1 cosine kernel scaling linearly
with A*B (96x16: 6.40 ms -> 64x16: 4.36 ms) but the FULL tpu_fast sweep
got SLOWER (6.57 -> 7.34 ms). The sweep's production call is
cos_node_grads_pallas with the "recur" default variant — this script
times every (degrees x variant) cell of the PRODUCTION kernel plus the
in-segment sweep, at the converged sigma=0.05 state, to locate the ~3 ms.

Emits one JSON line per measurement to results/diag_64x16.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.jax_cache"))
    import jax
    import jax.numpy as jnp

    from gqmap_tpu.config import FlowRange, GQMAPConfig
    from gqmap_tpu.kernels.cosine_gq import cos_mode_sums_pallas
    from gqmap_tpu.kernels.roofline import timed
    from gqmap_tpu.models.gqmap import (init_state, make_problem,
                                        make_segment_runner)

    out = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "diag_64x16.jsonl"), "a")

    def emit(**kw):
        print(json.dumps(kw), flush=True)
        out.write(json.dumps(kw) + "\n")
        out.flush()

    M, N = 376, 452
    r = np.random.default_rng(0)
    I1 = r.uniform(0, 255, (M, N))
    I2 = np.roll(I1, 1, axis=1)
    fr = FlowRange(-10.0, 2.0, -2.0, 2.0)

    for A, B in ((96, 16), (64, 16), (48, 16)):
        cfg = GQMAPConfig.tpu_fast(dtype="float32", cheb_p=A, cheb_q=B)
        problem = make_problem(cfg, I1, I2, fr)
        state = init_state(cfg, fr, I1.shape)
        state = state._replace(sigmau=jnp.full_like(state.sigmau, 0.05),
                               sigmav=jnp.full_like(state.sigmav, 0.05))

        # isolated mode-sum kernel, each variant (serialized fori chain,
        # two-trip-count differencing — the roofline measurement rule)
        for variant in ("v1", "adaptive", "recur"):
            for a_block in (None, 32) if A == 64 else (None,):
                def kloop(ch, s, n, _v=variant, _ab=a_block):
                    def body(i, acc):
                        outs = cos_mode_sums_pallas(
                            ch, s.muu + acc, s.muv, s.sigmau, s.sigmav,
                            s.pn, a_block=_ab, variant=_v)
                        return outs[0].ravel()[0] * jnp.asarray(1e-30,
                                                               s.muu.dtype)
                    return jax.lax.fori_loop(0, n, body,
                                             jnp.zeros((), s.muu.dtype))

                t = timed(kloop, problem.cheb, state, n1=4, n2=34)
                emit(kind="mode_sums", A=A, B=B, variant=variant,
                     a_block=a_block, ms=round(t * 1e3, 3))

        # full sweep in-segment (production path)
        import dataclasses
        cfg_seg = dataclasses.replace(cfg, tor=0.0, eval_every=300)
        seg = make_segment_runner(cfg_seg, I1.shape)
        st, n, eb, *_ = seg(problem, state, 10)
        float(eb[0])
        t0 = time.time()
        st, n, eb, *_ = seg(problem, st, 300)
        float(eb[299])
        emit(kind="segment_sweep", A=A, B=B,
             ms=round((time.time() - t0) / 300 * 1e3, 3))


if __name__ == "__main__":
    main()
