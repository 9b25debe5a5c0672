"""Round-5 accuracy/performance campaign orchestrator (VERDICT r04 items
1, 2, 4, 5, 9 + the f32-conditioning artifact of item 6).

Runs every round-5 TPU job SERIALLY on the one chip, highest value first,
resumable via its own step ledger (results/campaign/r05_done.json):

1.  frontier   — the degrees-vs-accuracy frontier that has never been
                 measured (item 1, the round's top_next): grid over the
                 cosine degrees (A, B) on RubberWhale + Dimetrodon
                 full-res (random init) and Teddy (blockmatch init,
                 192-class A), 10000 its each, recorded to
                 results/degrees_frontier.jsonl. Kernel time scales
                 ~linearly with A*B, so a smaller accuracy-equivalent
                 point raises converged throughput proportionally.
2.  newflag    — if the frontier shows a smaller point holding AEPE
                 within 2% of 96x16 on both small-motion sequences, run
                 the 30000-it full-budget verification on the trio at
                 that point (the contract-grade evidence for re-picking
                 the flagship).
3.  abfull     — the full-res exact-vs-cosine parity arms (item 2):
                 Teddy @2000 its, cosine x 3 seeds + bicubic seed 0
                 (complex-packed, ~2.5 s/sweep -> the long job).
4.  lam-cones  — LearnRatio.m's lambda lever on the second headline
                 sequence (item 4), bracketing the Teddy winner.
5.  lam-best   — the winning (lambda, seq) configs run to the
                 reference's full 30000-it budget: the framework's best
                 published Teddy/Cones numbers.
6.  rb2        — red-black promotion A/B (item 5): Teddy (blockmatch
                 init) and the super preset on Hydrangea, matched sweep
                 count with per-sweep wall recorded (the npz AEPE traces
                 + ms/sweep give the matched-WALL comparison).
7.  ctfflag    — one `cli ctf --level-init random` run at the CLI
                 surface (item 9), recorded to variants.jsonl.
8.  f32cond    — f32-vs-f64 conditioning artifact (item 6) via
                 scripts/f32_conditioning.py.
9.  seeds      — finish the quarter-scale A/B matrix (item 2's second
                 half): Dimetrodon + Grove2 x 3 seeds x both arms +
                 the pending RubberWhale bicubic seed 2. Each run is
                 individually resumable; lowest priority because each
                 bicubic run is ~13 min.
"""

import dataclasses
import json
import math
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "results", "campaign")
FRONTIER = os.path.join(REPO, "results", "degrees_frontier.jsonl")
LEDGER = os.path.join(OUT, "r05_done.json")


def ledger():
    if os.path.exists(LEDGER):
        with open(LEDGER) as f:
            return set(json.load(f))
    return set()


def mark(step):
    done = ledger() | {step}
    os.makedirs(OUT, exist_ok=True)
    with open(LEDGER, "w") as f:
        json.dump(sorted(done), f)


def step(name, only):
    if only is not None and name not in only:
        return False
    if name in ledger():
        print(f"[r05] skip {name} (ledger)", flush=True)
        return False
    print(f"[r05] === {name} ===", flush=True)
    return True


# ---------------------------------------------------------------- frontier

def frontier_done():
    done = set()
    if os.path.exists(FRONTIER):
        with open(FRONTIER) as f:
            for line in f:
                try:
                    r = json.loads(line)
                    done.add((r["seq"], r["A"], r["B"], r["its"]))
                except (json.JSONDecodeError, KeyError):
                    continue
    return done


def frontier_run(seq_name, A, B, its=10000, init="random", lambdas=5.0):
    """One frontier point: tpu_fast at degrees (A, B), recorded to
    degrees_frontier.jsonl (NOT campaign.jsonl: 30 grid rows must not
    pollute the per-sequence-best table)."""
    from gqmap_tpu.config import GQMAPConfig
    from gqmap_tpu.io.dataset import load_sequence
    from gqmap_tpu.models.gqmap import solve

    if (seq_name, A, B, its) in frontier_done():
        print(f"skip frontier {seq_name} {A}x{B}@{its}", flush=True)
        return
    seq = load_sequence(seq_name)
    fl = None
    if init == "blockmatch":
        from best_variants import gt_ranges
        from gqmap_tpu.models.blockmatch import block_matching_init

        minu, maxu, minv, maxv = gt_ranges(seq)
        U = int(math.ceil(max(abs(minv), abs(maxv)))) + 2
        V = int(math.ceil(max(abs(minu), abs(maxu)))) + 2
        fl = block_matching_init(seq.img1, seq.img2, U=U, V=V)
    cfg = GQMAPConfig.tpu_fast(dtype="float32", cheb_p=A, cheb_q=B,
                               its=its, lambdas=lambdas)
    t0 = time.time()
    res = solve(cfg, seq.img1, seq.img2, gt_flow=seq.gt_flow, seed=0,
                init_flow=fl, verbose=False)
    wall = time.time() - t0
    evals = np.where(np.isfinite(res.AEPE))[0]
    rec = dict(
        seq=seq_name, A=A, B=B, its=its, seed=0, init=init,
        lambdas=lambdas,
        best_aepe=float(res.best_aepe),
        final_aepe=float(res.AEPE[evals[-1]]) if evals.size else None,
        iters=int(res.iters), wall_s=round(wall, 1),
        ms_per_sweep=round(wall / max(res.iters, 1) * 1e3, 2),
    )
    print(json.dumps(rec), flush=True)
    with open(FRONTIER, "a") as f:
        f.write(json.dumps(rec) + "\n")


def pick_candidate():
    """Smallest-A*B grid point whose 10000-it AEPE stays within 2% of the
    96x16 incumbent on BOTH small-motion sequences. Returns (A, B) or
    None (96x16 is accuracy-minimal at the measured grid)."""
    rows = {}
    with open(FRONTIER) as f:
        for line in f:
            r = json.loads(line)
            if r["init"] == "random" and r["its"] >= 10000:
                rows[(r["seq"], r["A"], r["B"])] = r["best_aepe"]
    base = {s: rows.get((s, 96, 16)) for s in ("RubberWhale", "Dimetrodon")}
    if any(v is None for v in base.values()):
        return None
    cands = sorted({(a, b) for (_, a, b) in rows}, key=lambda ab: ab[0] * ab[1])
    for (a, b) in cands:
        if (a, b) == (96, 16):
            break  # nothing smaller qualified
        ok = all(
            rows.get((s, a, b)) is not None
            and rows[(s, a, b)] <= base[s] * 1.02
            for s in ("RubberWhale", "Dimetrodon")
        )
        if ok:
            return (a, b)
    return None


# ---------------------------------------------------------------- main

def main(only=None):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.jax_cache"))
    os.environ.setdefault("GQMAP_CAMPAIGN_FORCE", "0")

    from gqmap_tpu.config import GQMAPConfig

    import accuracy_campaign as ac
    from campaign_r04 import lam_sweep

    if step("frontier", only):
        # small-motion grid, random init (matches the full_cosine contract
        # rows). Every distinct (A, B) is a fresh XLA program (~3-5 min
        # compile on the tunneled runtime), so the grid is a 6-point
        # descent spanning A*B 1536 -> 256 rather than a full product.
        grid = [(96, 16), (64, 16), (64, 12), (48, 12), (48, 8), (32, 8)]
        for seq in ("RubberWhale", "Dimetrodon"):
            for (a, b) in grid:
                frontier_run(seq, a, b)
        # stereo-scale points, blockmatch init (the lambda-sweep
        # convention: reaches the plateau region in 10000 its)
        for (a, b) in [(192, 12), (128, 12), (128, 8), (96, 12)]:
            frontier_run("Teddy", a, b, init="blockmatch")
        mark("frontier")

    if step("newflag", only):
        cand = pick_candidate()
        rec = {"candidate": list(cand) if cand else None}
        if cand is None:
            print("[r05] newflag: 96x16 is accuracy-minimal at the "
                  "measured grid; no verification runs needed", flush=True)
        else:
            a, b = cand
            print(f"[r05] newflag candidate {a}x{b}: 30000-it verification",
                  flush=True)
            for seq in ("RubberWhale", "Dimetrodon", "Grove2"):
                cfg = GQMAPConfig.tpu_fast(dtype="float32", cheb_p=a, cheb_q=b)
                ac.run_one(f"flag{a}x{b}_cosine", cfg, seq)
        with open(os.path.join(OUT, "r05_newflag.json"), "w") as f:
            json.dump(rec, f)
        mark("newflag")

    if step("abfull", only):
        for seed in (0, 1, 2):
            cfg = GQMAPConfig.full_mixture(
                data_term="cosine", cheb_p=192, cheb_q=12, edge_quad="reduced",
                dtype="float32", its=2000, eval_every=200)
            ac.run_one("abfull_cosine", cfg, "Teddy", seed=seed)
        # exact arm: ~2.5 s/sweep full-res complex-packed — eval_every=25
        # keeps each on-device segment under the tunneled watchdog
        cfg = GQMAPConfig.full_mixture(data_term="bicubic", quad_chunk=27,
                                       dtype="float32", its=2000, eval_every=25)
        ac.run_one("abfull_bicubic", cfg, "Teddy", seed=0)
        mark("abfull")

    if step("lam-cones", only):
        lam_sweep("Cones", [0.5, 0.7, 1.0, 1.5, 2.0, 3.5, 5.0, 7.0])
        mark("lam-cones")

    if step("lam-best", only):
        # winning lambdas at the reference's full budget. Teddy's winner is
        # 1.0 (r04 sweep); Cones' read from its fresh sweep.
        rows = {}
        with open(os.path.join(OUT, "lambda_sweep.jsonl")) as f:
            for line in f:
                r = json.loads(line)
                if r.get("its") == 10000:
                    rows.setdefault(r["seq"], {})[r["lambdas"]] = r["best_aepe"]
        best_cones = min(rows.get("Cones", {1.0: 0}), key=rows.get("Cones", {1.0: 0}).get)
        for seq, lam in (("Teddy", 1.0), ("Cones", float(best_cones))):
            lam_sweep(seq, [lam], its=30000)
        mark("lam-best")

    if step("rb2", only):
        # Teddy, blockmatch init (the iteration-bottleneck workload)
        from best_variants import gt_ranges
        from gqmap_tpu.io.dataset import load_sequence
        from gqmap_tpu.models.blockmatch import block_matching_init

        seq = load_sequence("Teddy")
        minu, maxu, minv, maxv = gt_ranges(seq)
        U = int(math.ceil(max(abs(minv), abs(maxv)))) + 2
        V = int(math.ceil(max(abs(minu), abs(maxu)))) + 2
        fl = block_matching_init(seq.img1, seq.img2, U=U, V=V)
        for order in ("jacobi", "redblack"):
            cfg = GQMAPConfig.tpu_fast(dtype="float32", cheb_p=192, cheb_q=12,
                                       its=10000, sweep_order=order)
            ac.run_one(f"order_{order}", cfg, "Teddy", init_flow=fl)
        # super preset on a stage-B sequence
        for order in ("jacobi", "redblack"):
            cfg = GQMAPConfig.tpu_fast_super(dtype="float32", cheb_p=96,
                                             cheb_q=48, its=15000,
                                             sweep_order=order)
            ac.run_one(f"order_{order}_super", cfg, "Hydrangea")
        mark("rb2")

    if step("ctfflag", only):
        # the reference-faithful negative result at the CLI surface
        # (VERDICT item 9): cli ctf --level-init random
        cmd = [sys.executable, "-m", "gqmap_tpu.cli.main", "ctf",
               "--seq", "Dimetrodon", "--preset", "ctf_level",
               "--data-term", "cosine", "--cheb-p", "96", "--cheb-q", "16",
               "--level-init", "random", "--quiet"]
        t0 = time.time()
        out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        rec = json.loads(line)
        row = dict(tag="ctf_refinit_cli", seq="Dimetrodon", seed=0,
                   best_aepe=rec["aepe"], best_at=None, iters=3000 * 4,
                   wall_s=round(time.time() - t0, 1), K=11, L=1, patch=1,
                   data_term="cosine", cheb_p=96, cheb_q=16, lambdas=5.0,
                   temperature=0.0, init="pyramid-random")
        print(json.dumps(row), flush=True)
        with open(os.path.join(OUT, "variants.jsonl"), "a") as f:
            f.write(json.dumps(row) + "\n")
        mark("ctfflag")

    if step("f32cond", only):
        rc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "f32_conditioning.py")],
            cwd=REPO).returncode
        if rc == 0:
            mark("f32cond")
        else:
            print(f"[r05] f32cond failed rc={rc}; not marked", flush=True)

    if step("seeds", only):
        # quarter-scale matrix completion, highest-value first (each
        # bicubic run is ~13 min; every run individually resumable).
        # With abfull's full-res Teddy arms, RubberWhale + Dimetrodon +
        # Teddy give the >=3-sequence matrix; Grove2 is the stretch tail.
        base = dict(dtype="float32", its=2000, eval_every=100)
        cfg = GQMAPConfig.full_mixture(data_term="bicubic", quad_chunk=27, **base)
        ac.run_one("ab_bicubic", cfg, "RubberWhale", scale=0.25, seed=2)
        for seq in ("Dimetrodon", "Grove2"):
            for seed in (0, 1, 2):
                cfg = GQMAPConfig.full_mixture(
                    data_term="cosine", cheb_p=96, cheb_q=16,
                    edge_quad="reduced", **base)
                ac.run_one("ab_cosine", cfg, seq, scale=0.25, seed=seed)
                cfg = GQMAPConfig.full_mixture(
                    data_term="bicubic", quad_chunk=27, **base)
                ac.run_one("ab_bicubic", cfg, seq, scale=0.25, seed=seed)
        mark("seeds")

    print("[r05] campaign complete", flush=True)


if __name__ == "__main__":
    main(set(sys.argv[1].split(",")) if len(sys.argv) > 1 else None)
