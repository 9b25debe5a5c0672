"""Roofline harness for the GQ sweep on the current backend.

Measures the machine's relevant ceilings (HBM stream bandwidth, VPU
elementwise rate, arbitrary-index gather rate — the TPU-specific bound
that governs the exact data term) and the achieved per-sweep time of each
data-term mode, then reports achieved fraction of the governing bound.

IMPORTANT measurement notes (learned the hard way on the tunneled runtime):
``block_until_ready`` does not actually synchronize there — every timing
below forces a scalar literal fetch. The host round-trip is ~25 ms with
~±20 ms jitter, so ceilings are measured by running the op many times
inside one on-device ``fori_loop`` with a *traced* trip count and
differencing two trip counts of the same executable (see ``timed``); and
microbenchmark loop bodies must resist XLA's algebraic loop collapsing
(vector multiplier, index-dependent gathers).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FlowRange, GQMAPConfig
from ..models.gqmap import init_state, make_problem, make_sweep

__all__ = ["measure_ceilings", "sweep_roofline", "flagship_roofline", "main"]


def _sync_time(fn, *args, n=5):
    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        v = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.time() - t0) / n, v


def timed(fn, *args, n1, n2):
    """Per-iteration time via two trip counts of ONE compiled program.

    ``fn(*args, n)`` must run ``n`` iterations of the op under test inside
    one on-device loop. The loop bound is a traced argument, so both calls
    hit the same executable; differencing the two elapsed times cancels
    dispatch, tunnel round-trip and fetch overhead. Tunnel jitter is
    ~±20 ms, so callers must pick (n2 - n1) large enough that the work
    difference is >= ~0.5 s (subtracting a separately-sampled latency, or
    using small trip counts, both produced nonsense ceilings).
    """
    f = jax.jit(fn)

    def run(n):
        t0 = time.time()
        float(jnp.sum(f(*args, jnp.asarray(n, jnp.int32))))
        return time.time() - t0

    run(n1)  # compile + warm
    t1 = min(run(n1) for _ in range(2))
    t2 = min(run(n2) for _ in range(2))
    return max(t2 - t1, 1e-9) / (n2 - n1)


def measure_ceilings(dtype=jnp.float32):
    """Machine ceilings, each microbenchmark amortized ON DEVICE.

    A single-dispatch measurement is useless on the tunneled runtime: the
    host round-trip is ~25 ms while the op under test takes ~0.1-2 ms, so
    the subtraction is all noise (this produced >1 "fractions of bound" in
    an earlier revision). Every ceiling below runs its op inside one
    ``lax.fori_loop`` with a traced trip count (see :func:`timed`), so the
    dispatch cost is paid once and differenced out.
    """
    key = jax.random.PRNGKey(0)

    # round-trip latency (reported for context only)
    lat, _ = _sync_time(jax.jit(lambda x: x + 1.0), jnp.zeros((), dtype))

    # HBM stream: big elementwise vector multiply (2 reads + 1 write per
    # iteration) repeated on device. The multiplier must be a VECTOR: with
    # a scalar factor XLA hoists the product out of the loop and the
    # "stream" degenerates to per-iteration loop overhead (measured: 24 us
    #/iter vs the real 92 us/iter).
    big = jax.random.uniform(key, (64 * 1024 * 1024 // 4,), dtype)  # 64 MB
    mulv = jax.random.uniform(jax.random.PRNGKey(1), big.shape, dtype) * 1e-9 + 1.0

    def stream(x, bb, n):
        def body(i, a):
            return a * bb
        return jax.lax.fori_loop(0, n, body, x).sum()

    t = timed(stream, big, mulv, n1=64, n2=4160)
    stream_gbs = 3.0 * big.size * big.dtype.itemsize / max(t, 1e-9) / 1e9

    # VPU mul/add rate: a pure FMA chain (a = a*b + c, 32 steps per element
    # per iteration). The earlier sqrt/mul/add blend counted each sqrt as one
    # flop and under-reported the ceiling enough that the cosine kernel
    # measured >1.0 of "bound" (roofline_r03). The multiplier/addend are
    # vectors so nothing hoists; 32 dependent steps amortize the 48 MB/iter
    # stream far below the compute time.
    x = jax.random.uniform(key, (16 * 1024 * 1024 // 4,), dtype) + 0.5
    bmul = jax.random.uniform(jax.random.PRNGKey(2), x.shape, dtype) * 1e-6 + 0.9
    cadd = jax.random.uniform(jax.random.PRNGKey(3), x.shape, dtype) * 0.1

    def fma_chain(x0, bb, cc, n):
        def body(i, a):
            for _ in range(32):
                a = a * bb + cc
            return a
        return jax.lax.fori_loop(0, n, body, x0).sum()

    t = timed(fma_chain, x, bmul, cadd, n1=64, n2=576)
    vpu_gflops = x.size * 64.0 / max(t, 1e-9) / 1e9

    # arbitrary-index gather rate (the bound on the exact bicubic term).
    # The index vector alternates between two PRECOMPUTED offset variants
    # (selected by k % 2) so the loop cannot be CSEd without paying a
    # per-iteration vector add that would inflate the per-tap time; trip
    # counts sized so the differenced gather work is ~2 s at the measured
    # ~140 Mtaps/s (>= the 0.5 s the `timed` contract requires).
    tab = jax.random.uniform(key, (380 * 456,), dtype)
    idx = jax.random.randint(key, (8_000_000,), 0, tab.size - 2, jnp.int32)
    idx2 = jnp.stack([idx, idx + 1])

    def gather(t_, i2_, n):
        def body(k, acc):
            iv = jax.lax.dynamic_index_in_dim(i2_, k % 2, 0, keepdims=False)
            return acc + jnp.take(t_, iv).sum()
        return jax.lax.fori_loop(0, (n + 7) // 8, body, jnp.zeros((), dtype))

    t = timed(gather, tab, idx2, n1=16, n2=304) * 8
    gather_mps = idx.size / max(t, 1e-9) / 1e6

    # transcendental (exp) rate — the cosine kernel issues 2 exps per mode
    y = jax.random.uniform(key, (16 * 1024 * 1024 // 4,), dtype) * -0.1

    def expchain(y0, n):
        def body(i, a):
            for _ in range(10):
                a = jnp.exp(a * -0.9)
            return a
        return jax.lax.fori_loop(0, n, body, y0).sum()

    t = timed(expchain, y, n1=64, n2=576)
    exp_gops = y.size * 10.0 / max(t, 1e-9) / 1e9

    return dict(
        roundtrip_ms=lat * 1e3,
        hbm_stream_GBps=stream_gbs,
        vpu_GFLOPs=vpu_gflops,
        gather_Mtaps_s=gather_mps,
        exp_Gops=exp_gops,
    )


def sweep_roofline(image_shape=(376, 452), seed=0,
                   modes=("cosine", "chebyshev", "nearest", "bicubic"),
                   ceilings=None):
    """Per-sweep time and bound-efficiency for each data-term mode.

    The flagship ``cosine`` mode runs FIRST so a watchdog kill partway
    through (the exact ``bicubic`` mode takes ~8 s/sweep) still leaves the
    number that matters.
    """
    M, N = image_shape
    r = np.random.default_rng(seed)
    I1 = r.uniform(0, 255, (M, N))
    I2 = np.roll(I1, 1, axis=1)
    fr = FlowRange(-10.0, 2.0, -2.0, 2.0)
    ceil = measure_ceilings() if ceilings is None else ceilings
    out = {"ceilings": ceil, "modes": {}}

    for mode in modes:
        if mode == "cosine":
            # flagship degrees (64x16 since the r05 frontier re-pick)
            cfg = GQMAPConfig.tpu_fast(dtype="float32")
        else:
            cfg = GQMAPConfig.full_mixture(
                dtype="float32", quad_chunk=27, data_term=mode, cheb_p=96, cheb_q=16
            )
        problem = make_problem(cfg, I1, I2, fr)
        # converged-sigma state: the steady-state regime the bounds model —
        # at wide (init) sigma the adaptive cosine kernel skips most modes
        # and "efficiency vs full-mode bound" would exceed 1 meaninglessly
        state = init_state(cfg, fr, I1.shape)
        state = state._replace(sigmau=jnp.full_like(state.sigmau, 0.05),
                               sigmav=jnp.full_like(state.sigmav, 0.05))
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
        # complex-packed bicubic (cfg.bicubic_pack, the default) fetches 8
        # complex64 taps per sample instead of 16 f32 — the gather bound is
        # index-rate-set, so the packed mode's bound halves with the count.
        # The packed path only engages for f32 state (f64 golden configs
        # fall back to 16 real taps in ops/interp.sample_bicubic — mirror
        # that condition here or the f64 bound reads 2x too tight).
        packed = cfg.bicubic_pack and cfg.dtype == "float32"
        bicubic_taps = 8 if packed else 16
        taps = {"bicubic": bicubic_taps, "nearest": 1, "chebyshev": 0, "cosine": 0}[mode] * sites * K2
        if taps:
            bound_s = taps / (ceil["gather_Mtaps_s"] * 1e6)
            governing = "gather"
        elif mode == "cosine":
            # closed form: no quadrature; ~36 flops per (mode, site) in the
            # characteristic-function mode loop (kernels/cosine_gq.py)
            flops = sites * cfg.cheb_p * cfg.cheb_q * 36
            bound_s = flops / (ceil["vpu_GFLOPs"] * 1e9)
            governing = "vpu"
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


def flagship_roofline(image_shape=(376, 452), seed=0, A=64, B=16, ceilings=None):
    """Achieved fraction of the governing ceiling for the flagship path.

    Two measurements (VERDICT r1 item 4 — a number, not prose):

    * the Pallas cosine mode-sum kernel alone, against the max of its three
      candidate bounds — VPU flops (~36/mode/site: the W/trig/accumulator
      arithmetic), transcendentals (2 exp/mode/site), and HBM traffic (the
      (A, B, M, N) coefficient stream + 5 state reads / 6 sum writes);
    * the full tpu_fast sweep IN-SEGMENT (production execution shape),
      against the summed component bounds (node kernel + reduced-edge
      evals + the sweep's residual HBM traffic for gather/assembly/update/
      reduction passes over the edge-field arrays).
    """
    import dataclasses
    import math

    M, N = image_shape
    r = np.random.default_rng(seed)
    I1 = r.uniform(0, 255, (M, N))
    I2 = np.roll(I1, 1, axis=1)
    fr = FlowRange(-10.0, 2.0, -2.0, 2.0)
    ceil = measure_ceilings() if ceilings is None else ceilings

    cfg = GQMAPConfig.tpu_fast(dtype="float32", cheb_p=A, cheb_q=B)
    problem = make_problem(cfg, I1, I2, fr)
    # converged-sigma state (see sweep_roofline): the fractions compare
    # against full-mode bounds, so measure the regime where all modes run
    state = init_state(cfg, fr, I1.shape)
    state = state._replace(sigmau=jnp.full_like(state.sigmau, 0.05),
                           sigmav=jnp.full_like(state.sigmav, 0.05))
    L = cfg.L
    sites = L * M * N
    modes = A * B

    # --- Pallas kernel alone, timed the same two-trip-count way as the
    # ceilings: the kernel runs inside one on-device fori_loop whose input
    # depends on the previous iteration's output (no hoisting/overlap), and
    # two traced trip counts of the SAME executable are differenced — the
    # single-dispatch-minus-latency pattern this replaced produced nonsense
    # >1 fractions on the tunneled runtime. ---
    from .cosine_gq import cos_mode_sums_pallas

    def kloop(ch, s, n):
        def body(i, acc):
            # variant="v1": the bound below counts ALL A*B modes, so the
            # measured kernel must run all of them too — the adaptive
            # cutoff would make fraction_of_bound meaningless at wide sigma
            # (its gain is recorded separately in results/kernel_ab.jsonl).
            outs = cos_mode_sums_pallas(
                ch, s.muu + acc, s.muv, s.sigmau, s.sigmav, s.pn,
                a_block=cfg.cheb_ablock, variant="v1",
            )
            # serialize iterations through a value that is always ~0
            return outs[0].ravel()[0] * jnp.asarray(1e-30, s.muu.dtype)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), s.muu.dtype))

    t_k = timed(kloop, problem.cheb, state, n1=4, n2=34)
    kernel_flops = sites * modes * 36.0
    kernel_exps = sites * modes * 2.0
    kernel_bytes = 4.0 * (A * B * M * N + 11 * sites)
    bounds = dict(
        vpu=kernel_flops / (ceil["vpu_GFLOPs"] * 1e9),
        exp=kernel_exps / (ceil["exp_Gops"] * 1e9),
        hbm=kernel_bytes / (ceil["hbm_stream_GBps"] * 1e9),
    )
    governing = max(bounds, key=bounds.get)
    kernel = dict(
        ms=t_k * 1e3,
        bound_ms={k: v * 1e3 for k, v in bounds.items()},
        governing=governing,
        fraction_of_bound=bounds[governing] / t_k,
    )

    # --- full sweep in-segment ---
    from ..models.gqmap import make_segment_runner

    cfg_seg = dataclasses.replace(cfg, tor=0.0, eval_every=300)
    seg = make_segment_runner(cfg_seg, I1.shape)
    st, n, eb, *_ = seg(problem, state, 10)
    float(eb[0])
    t0 = time.time()
    st, n, eb, *_ = seg(problem, st, 300)
    float(eb[299])
    t_s = (time.time() - t0) / 300

    # edge bound: 4 edge fields x K1-point 1-D rule, ~8 flops per eval,
    # plus one streaming pass over the 12-plane edge arrays for each of
    # the gather/quadrature/finalize/assembly stages (~6 passes measured
    # from the HLO) and the update/reduction pass over the state.
    k1 = 2 * cfg.K + 3
    edge_sites = 4 * sites
    edge_flops = edge_sites * k1 * 8.0
    sweep_bytes = 4.0 * (edge_sites * 12 * 6 + 8 * sites * 4)
    full_bound = (
        max(bounds.values())
        + max(edge_flops / (ceil["vpu_GFLOPs"] * 1e9),
              edge_sites * 12 * 4.0 * 4 / (ceil["hbm_stream_GBps"] * 1e9))
        + sweep_bytes / (ceil["hbm_stream_GBps"] * 1e9)
    )
    sweep = dict(
        ms=t_s * 1e3,
        mpix_sweeps_per_s=M * N / t_s / 1e6,
        bound_ms=full_bound * 1e3,
        fraction_of_bound=full_bound / t_s,
    )
    return {"ceilings": ceil, "pallas_cosine_kernel": kernel, "tpu_fast_sweep": sweep}


def main(argv=None):
    """Flagship first (the number the ≥70%-of-bound target is about), then
    the per-mode table. ``argv``: optional mode list, e.g.
    ``python -m gqmap_tpu.kernels.roofline cosine chebyshev``."""
    import sys

    argv = sys.argv[1:] if argv is None else argv
    ceil = measure_ceilings()
    out = {"flagship": flagship_roofline(ceilings=ceil)}
    modes = tuple(argv) if argv else ("cosine", "chebyshev", "nearest", "bicubic")
    out.update(sweep_roofline(modes=modes, ceilings=ceil))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
