"""Time the Pallas cosine mode-sum kernel vs the XLA path on the real TPU.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/cosine_pallas_bench.py
"""

import time

import jax
import jax.numpy as jnp

from gqmap_tpu.config import GQMAPConfig
from gqmap_tpu.models.gqmap import init_state, make_problem


def timeit(fn, *args, reps=6):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.time() - t0) / reps


def main():
    from bench import load_problem_images

    from gqmap_tpu.kernels.cosine_gq import cos_mode_sums_pallas
    from gqmap_tpu.ops.cosine import _mode_sums

    I1, I2, fr = load_problem_images()
    cfg = GQMAPConfig.tpu_fast(dtype="float32")
    problem = make_problem(cfg, I1, I2, fr)
    state = init_state(cfg, fr, I1.shape)
    cos = problem.cheb
    args = (state.muu, state.muv, state.sigmau, state.sigmav, state.pn)
    print("coeffs", cos.coeffs.shape, cos.coeffs.dtype,
          "state", state.muu.shape)

    # Pass `cos` as a jit ARGUMENT — closing over it would bake the ~1 GB
    # coefficient field into the compile payload (remote compile rejects it).
    t = timeit(
        jax.jit(lambda c, *a: _mode_sums(c, *a, a_block=8, want_grads=True)[0]),
        cos, *args)
    print(f"XLA   _mode_sums      : {t*1e3:8.2f} ms")

    for rows in (8, 16, 32):
        for ab in (8, 16):
            try:
                fn = jax.jit(lambda c, *a, _r=rows, _ab=ab: cos_mode_sums_pallas(
                    c, *a, a_block=_ab, rows=_r))
                t = timeit(fn, cos, *args)
                print(f"Pallas rows={rows:3d} ab={ab:3d}: {t*1e3:8.2f} ms")
            except Exception as e:
                print(f"Pallas rows={rows:3d} ab={ab:3d}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
