"""Weak-scaling benchmark harness (SURVEY.md section 7.1 step 5).

Fixed per-device lattice tile, total lattice grown with the device count:
ideal weak scaling keeps ms/sweep constant as devices are added
(efficiency = t_1device / t_Ndevice -> 1.0). The sweep is the flagship
cosine path run IN-SEGMENT (one ``lax.while_loop`` per measurement, one
literal fetch at the end — the tunneled-runtime measurement rule from
PERFORMANCE.md), GSPMD-sharded over a (dp=1, x, y) mesh exactly as
``solve(mesh=...)`` runs it.

Runs today on the virtual CPU mesh::

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python scripts/weak_scaling.py --tile 64 128 --modes 16 8 --sweeps 10

and unchanged on real multi-chip TPU hardware (where the default flagship
tile 376x452 / P=96 Q=16 applies); a single-chip TPU run records the
1-device row. Appends one JSON line per invocation to
``results/weak_scaling.jsonl``.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "weak_scaling.jsonl")


def measure(d, tile, modes, sweeps, dtype="float32"):
    import jax

    from gqmap_tpu.config import FlowRange, GQMAPConfig
    from gqmap_tpu.models.gqmap import init_state, make_problem, make_segment_runner
    from gqmap_tpu.parallel import make_mesh
    from gqmap_tpu.parallel.sharded import shard_problem, shard_state

    mesh = make_mesh(d, dp=1)
    _, x, y = mesh.devices.shape
    M, N = tile[0] * x, tile[1] * y
    cfg = GQMAPConfig.tpu_fast(dtype=dtype, cheb_p=modes[0], cheb_q=modes[1],
                               eval_every=max(sweeps, 2), its=10**9)
    r = np.random.default_rng(0)
    I1 = r.uniform(0, 255, (M, N))
    I2 = np.roll(I1, 1, axis=1)
    fr = FlowRange(-10.0, 2.0, -2.0, 2.0)
    problem = shard_problem(make_problem(cfg, I1, I2, fr), mesh)
    state = shard_state(init_state(cfg, fr, I1.shape), mesh)
    seg = make_segment_runner(cfg, I1.shape, mesh=mesh)

    def run(n):
        st, k, eb, pb, sb, stop = seg(problem, state, n)
        t0 = float(eb[n - 1])  # literal fetch = the only real sync here
        return st

    run(2)  # compile + warm
    t0 = time.time()
    run(sweeps)
    dt = (time.time() - t0) / sweeps
    return dict(
        devices=d, mesh=dict(zip(mesh.axis_names, map(int, mesh.devices.shape))),
        lattice=[M, N], tile=list(tile), L=cfg.L, cheb_p=modes[0], cheb_q=modes[1],
        sweeps=sweeps, ms_per_sweep=round(dt * 1e3, 3),
        mpix_sweeps_per_s=round(M * N / dt / 1e6, 4),
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tile", nargs=2, type=int, default=None,
                    help="per-device lattice tile (default 376 452 on TPU, "
                         "64 128 on CPU)")
    ap.add_argument("--modes", nargs=2, type=int, default=None,
                    help="cosine degrees P Q (default 96 16 on TPU, 16 8 on CPU)")
    ap.add_argument("--sweeps", type=int, default=30)
    ap.add_argument("--devices", nargs="*", type=int, default=None,
                    help="device counts to measure (default: powers of 2 up "
                         "to the available count)")
    args = ap.parse_args(argv)

    import jax

    n_avail = jax.device_count()
    on_tpu = jax.default_backend() == "tpu"
    tile = tuple(args.tile) if args.tile else ((376, 452) if on_tpu else (64, 128))
    modes = tuple(args.modes) if args.modes else ((96, 16) if on_tpu else (16, 8))
    counts = args.devices
    if not counts:
        counts = [1]
        while counts[-1] * 2 <= n_avail:
            counts.append(counts[-1] * 2)

    rows = [measure(d, tile, modes, args.sweeps) for d in counts]
    base = rows[0]["ms_per_sweep"]
    for r in rows:
        r["weak_efficiency"] = round(base / r["ms_per_sweep"], 4)
    rec = dict(
        backend=jax.default_backend(), device=str(jax.devices()[0]),
        n_devices_available=n_avail, rows=rows,
        ts=time.strftime("%Y-%m-%dT%H:%M:%S"),
    )
    if jax.default_backend() == "cpu" and n_avail > 1:
        rec["note"] = (
            "virtual host devices share one CPU's cores: total work grows "
            "with N on fixed silicon, so weak_efficiency here validates the "
            "harness + sharding, not hardware scaling"
        )
    print(json.dumps(rec, indent=2))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
