"""Throughput benchmark: full-res mixture GQMAP sweep rate on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: Mpixel-sweeps/s/chip of the flagship solver (K=9, L=3 mixture,
bicubic data term) at Middlebury Teddy scale — the reference's headline
workload (``optical_flow.m``). The reference publishes no numbers
(BASELINE.md), so ``vs_baseline`` is relative to the best previously
recorded round (``BENCH_r*.json``), or 1.0 on the first measurement.
"""

import glob
import json
import os
import sys
import time

import numpy as np


def load_problem_images():
    try:
        from gqmap_tpu.io.dataset import load_sequence
        from gqmap_tpu.ops.flowviz import flow_to_color

        seq = load_sequence("Teddy")
        fc = flow_to_color(seq.gt_flow)
        from gqmap_tpu.config import FlowRange

        return seq.img1, seq.img2, FlowRange(fc.minu, fc.maxu, fc.minv, fc.maxv)
    except Exception:
        # synthetic fallback at the same scale
        from gqmap_tpu.config import FlowRange

        r = np.random.default_rng(0)
        I1 = r.uniform(0, 255, (376, 452))
        k = np.ones(5) / 5
        I1 = np.apply_along_axis(lambda a: np.convolve(a, k, "same"), 0, I1)
        I1 = np.apply_along_axis(lambda a: np.convolve(a, k, "same"), 1, I1)
        I2 = np.roll(I1, 1, axis=1)
        return I1, I2, FlowRange(-10.0, 2.0, -2.0, 2.0)


def previous_best():
    best = None
    for path in glob.glob("BENCH_r*.json"):
        try:
            with open(path) as f:
                rec = json.load(f)
            v = rec.get("value")
            if isinstance(v, (int, float)) and (best is None or v > best):
                best = float(v)
        except Exception:
            pass
    return best


def main():
    import jax

    from gqmap_tpu.config import GQMAPConfig
    from gqmap_tpu.models.gqmap import init_state, make_problem, make_sweep

    I1, I2, fr = load_problem_images()
    pixels = I1.size

    cfg = GQMAPConfig.full_mixture(dtype="float32", quad_chunk=27)
    problem = make_problem(cfg, I1, I2)._replace(rng=fr)
    state = init_state(cfg, fr, I1.shape)
    sweep = jax.jit(make_sweep(cfg, I1.shape))

    # warmup / compile
    s, aux = sweep(problem, state)
    jax.block_until_ready(s)

    # timed run: repeat until >= 2 s of work or 60 sweeps, whichever first
    n_done = 0
    t0 = time.time()
    while True:
        for _ in range(5):
            s, aux = sweep(problem, s)
        jax.block_until_ready(s)
        n_done += 5
        if time.time() - t0 > 2.0 or n_done >= 60:
            break
    dt = (time.time() - t0) / n_done
    value = pixels / dt / 1e6  # Mpixel-sweeps per second per chip

    prev = previous_best()
    out = {
        "metric": "gqmap_full_mixture_sweep_throughput",
        "value": round(value, 3),
        "unit": "Mpixel-sweeps/s/chip",
        "vs_baseline": round(value / prev, 3) if prev else 1.0,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
