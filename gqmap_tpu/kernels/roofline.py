"""Roofline harness for the GQ sweep on the current backend.

Measures the machine's relevant ceilings (HBM stream bandwidth, VPU
elementwise rate, arbitrary-index gather rate — the TPU-specific bound
that governs the exact data term) and the achieved per-sweep time of each
data-term mode, then reports achieved fraction of the governing bound.

IMPORTANT measurement note (learned the hard way on the tunneled runtime):
``block_until_ready`` does not actually synchronize there; every timing
below forces a scalar literal fetch, and the reported round-trip latency is
subtracted.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FlowRange, GQMAPConfig
from ..models.gqmap import init_state, make_problem, make_sweep

__all__ = ["measure_ceilings", "sweep_roofline", "main"]


def _sync_time(fn, *args, n=5):
    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        v = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.time() - t0) / n, v


def measure_ceilings(dtype=jnp.float32):
    key = jax.random.PRNGKey(0)

    # round-trip latency
    lat, _ = _sync_time(jax.jit(lambda x: x + 1.0), jnp.zeros((), dtype))

    # HBM stream: big copy-scale (read+write 2x)
    big = jax.random.uniform(key, (64 * 1024 * 1024 // 4,), dtype)  # 64 MB
    t, _ = _sync_time(jax.jit(lambda x: (x * 1.000001).sum()), big)
    stream_gbs = big.size * big.dtype.itemsize / max(t - lat, 1e-9) / 1e9

    # VPU elementwise rate (fused chain, ~20 flops/elem)
    x = jax.random.uniform(key, (16 * 1024 * 1024 // 4,), dtype)

    @jax.jit
    def chain(x):
        a = x
        for _ in range(10):
            a = jnp.sqrt(a * a + x)
        return a.sum()

    t, _ = _sync_time(chain, x)
    vpu_gflops = x.size * 30 / max(t - lat, 1e-9) / 1e9

    # arbitrary-index gather rate
    tab = jax.random.uniform(key, (380 * 456,), dtype)
    idx = jax.random.randint(key, (8_000_000,), 0, tab.size - 1, jnp.int32)
    t, _ = _sync_time(jax.jit(lambda t_, i: jnp.take(t_, i).sum()), tab, idx)
    gather_mps = idx.size / max(t - lat, 1e-9) / 1e6

    return dict(
        roundtrip_ms=lat * 1e3,
        hbm_stream_GBps=stream_gbs,
        vpu_GFLOPs=vpu_gflops,
        gather_Mtaps_s=gather_mps,
    )


def sweep_roofline(image_shape=(376, 452), seed=0, modes=("bicubic", "nearest", "chebyshev")):
    """Per-sweep time and bound-efficiency for each data-term mode."""
    M, N = image_shape
    r = np.random.default_rng(seed)
    I1 = r.uniform(0, 255, (M, N))
    I2 = np.roll(I1, 1, axis=1)
    fr = FlowRange(-10.0, 2.0, -2.0, 2.0)
    ceil = measure_ceilings()
    out = {"ceilings": ceil, "modes": {}}

    for mode in modes:
        cfg = GQMAPConfig.full_mixture(
            dtype="float32", quad_chunk=27, data_term=mode, cheb_p=96, cheb_q=16
        )
        problem = make_problem(cfg, I1, I2, fr)
        state = init_state(cfg, fr, I1.shape)
        fn = jax.jit(make_sweep(cfg, I1.shape))
        s, aux = fn(problem, state)
        float(aux.energy)
        n = 10
        t0 = time.time()
        for _ in range(n):
            s, aux = fn(problem, s)
        float(aux.energy)
        dt = (time.time() - t0) / n

        K2 = cfg.K**2
        sites = M * N * cfg.L
        taps = {"bicubic": 16, "nearest": 1, "chebyshev": 0}[mode] * sites * K2
        if taps:
            bound_s = taps / (ceil["gather_Mtaps_s"] * 1e6)
            governing = "gather"
        else:
            flops = sites * K2 * 2 * cfg.cheb_p * cfg.cheb_q  # ~2PQ MACs/sample
            bound_s = flops / (ceil["vpu_GFLOPs"] * 1e9)
            governing = "vpu"
        out["modes"][mode] = dict(
            ms_per_sweep=dt * 1e3,
            mpix_sweeps_per_s=M * N / dt / 1e6,
            governing_bound=governing,
            bound_ms=bound_s * 1e3,
            efficiency_vs_bound=min(1.0, bound_s / dt),
        )
    return out


def main():
    print(json.dumps(sweep_roofline(), indent=2))


if __name__ == "__main__":
    main()
