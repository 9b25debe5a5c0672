"""Round-4 accuracy campaign orchestrator (VERDICT r03 items 3, 4, 5, 9 +
the red-black A/B of item 6).

Runs every round-4 accuracy job SERIALLY on the one chip, highest value
first, resumable via its own step ledger (results/campaign/r04_done.json):

1.  rerun-A/B   — the reference's two live suites re-recorded on the r04
                  production kernel (flat site layout + recur variant), so
                  the campaign contract locks the shipping code path.
2.  seeds       — statistical weight for the exact-vs-cosine parity claim:
                  3 seeds x 3 sequences x {bicubic, cosine} @0.25 scale,
                  matched iterations/seed (VERDICT item 3).
3.  trio        — the commented-out full-res trio of optical_flow.m:3
                  (RubberWhale, Dimetrodon, Grove2) under the flagship
                  preset, completing the 8/8 GT-sequence matrix (item 5).
4.  lam-teddy   — the reference's own accuracy lever for the Teddy plateau:
                  LearnRatio.m's lambda_s sweep at 10000 its with
                  block-matching init (item 4).
5.  pre         — optical_flowSuper.m's preprocessed=true mode over the 4
                  shipped .mat inputs (item 5).
6.  ctf-small   — coarse-to-fine where it should work: small-motion
                  sequences (item 9).
7.  redblack    — iterations-to-AEPE A/B of the checkerboard sweep vs
                  Jacobi (item 6 "Done" criterion).
8.  abhalf      — the A/B on a workload where AEPE clearly improves from
                  init (RubberWhale @0.5; addresses the low-power critique
                  of the r03 A/B).
9.  lam-cones   — the lambda sweep on the second headline sequence.
10. abfull      — ONE full-res exact-parity arm: Teddy @2000 its bicubic
                  (complex-packed) vs cosine x 3 seeds (item 3's full-res
                  requirement). Longest job, last, safely interruptible.

Each underlying runner appends to the same artifacts as rounds 1-3
(results/campaign/campaign.jsonl, variants.jsonl; lambda sweeps to
results/campaign/lambda_sweep.jsonl).
"""

import dataclasses
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "campaign")
LEDGER = os.path.join(OUT, "r04_done.json")


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


def step(name):
    """Decorator-ish guard: returns True if the step should run."""
    if name in ledger():
        print(f"[r04] skip {name} (ledger)", flush=True)
        return False
    print(f"[r04] === {name} ===", flush=True)
    return True


def lam_sweep(seq_name, lambdas, its=10000):
    """LearnRatio.m's lever (legacy/LearnRatio.m:5-33) at campaign scale:
    full-res flagship cosine path, block-matching init (the 3x iteration
    saving measured in r03), one row per lambda_s."""
    from gqmap_tpu.config import GQMAPConfig
    from gqmap_tpu.io.dataset import load_sequence
    from gqmap_tpu.models.blockmatch import block_matching_init
    from gqmap_tpu.models.gqmap import solve
    from best_variants import gt_ranges

    log = os.path.join(OUT, "lambda_sweep.jsonl")
    seq = load_sequence(seq_name)
    minu, maxu, minv, maxv = gt_ranges(seq)
    U = int(math.ceil(max(abs(minv), abs(maxv)))) + 2
    V = int(math.ceil(max(abs(minu), abs(maxu)))) + 2
    fl = block_matching_init(seq.img1, seq.img2, U=U, V=V)
    for lam in lambdas:
        cfg = GQMAPConfig.tpu_fast(dtype="float32", cheb_p=192, cheb_q=12,
                                   its=its, lambdas=float(lam))
        t0 = time.time()
        res = solve(cfg, seq.img1, seq.img2, gt_flow=seq.gt_flow,
                    init_flow=fl, verbose=False)
        rec = dict(seq=seq_name, lambdas=float(lam),
                   best_aepe=float(res.best_aepe), iters=int(res.iters),
                   its=its, init="blockmatch",
                   wall_s=round(time.time() - t0, 1))
        print(json.dumps(rec), flush=True)
        with open(log, "a") as f:
            f.write(json.dumps(rec) + "\n")


def main(only=None):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.jax_cache"))
    # FORCE=1 only for the first pass (rerun-ab must not be skipped by
    # rounds-1..3 rows); restarts resume via campaign.jsonl dedup instead,
    # so a stage interrupted mid-way does not repeat its completed runs.
    os.environ["GQMAP_CAMPAIGN_FORCE"] = os.environ.get("R04_FORCE", "0")

    from gqmap_tpu.config import GQMAPConfig

    import accuracy_campaign as ac
    import best_variants as bv

    def run(name):
        return (only is None or name in only) and step(name)

    if run("rerun-ab"):
        ac.main(("A", "B"))
        mark("rerun-ab")

    if run("trio"):
        # small-motion full-res: GT boxes are ~+-5 px, so the flagship
        # 96x16 degree set resolves them finely
        for seq in ("RubberWhale", "Dimetrodon", "Grove2"):
            cfg = GQMAPConfig.tpu_fast(dtype="float32", cheb_p=96, cheb_q=16)
            ac.run_one("full_cosine", cfg, seq)
        mark("trio")

    if run("ctf-small"):
        for seq in ("Dimetrodon", "Grove2"):
            bv.run_ctf("ctf", GQMAPConfig.ctf_level(
                dtype="float32", data_term="cosine", cheb_p=96, cheb_q=16,
                edge_quad="reduced", quad_chunk=0), seq)
        mark("ctf-small")

    if run("redblack"):
        for order in ("jacobi", "redblack"):
            cfg = GQMAPConfig.tpu_fast(dtype="float32", cheb_p=96, cheb_q=16,
                                       its=6000, sweep_order=order)
            ac.run_one(f"order_{order}", cfg, "RubberWhale")
        mark("redblack")

    if run("lam-teddy"):
        lam_sweep("Teddy", [1.0, 2.0, 3.5, 5.0, 7.0, 10.0, 14.0, 20.0])
        mark("lam-teddy")

    if run("pre"):
        for seq in ("RubberWhale", "Dimetrodon", "Hydrangea", "Venus"):
            cfg = GQMAPConfig.tpu_fast_super(dtype="float32", cheb_p=96,
                                             cheb_q=48)
            ac.run_one("super_cosine_pre", cfg, seq, preprocessed=True)
        mark("pre")

    if run("seeds"):
        base = dict(dtype="float32", its=2000, eval_every=100)
        for seq in ("RubberWhale", "Dimetrodon", "Grove2"):
            for seed in (0, 1, 2):
                cfg = GQMAPConfig.full_mixture(
                    data_term="cosine", cheb_p=96, cheb_q=16,
                    edge_quad="reduced", **base)
                ac.run_one("ab_cosine", cfg, seq, scale=0.25, seed=seed)
                cfg = GQMAPConfig.full_mixture(
                    data_term="bicubic", quad_chunk=27, **base)
                ac.run_one("ab_bicubic", cfg, seq, scale=0.25, seed=seed)
        mark("seeds")

    if run("abfull"):
        for seed in (0, 1, 2):
            cfg = GQMAPConfig.full_mixture(
                data_term="cosine", cheb_p=192, cheb_q=12, edge_quad="reduced",
                dtype="float32", its=2000, eval_every=200)
            ac.run_one("abfull_cosine", cfg, "Teddy", seed=seed)
        # exact arm: ~2.4 s/sweep full-res even complex-packed — keep each
        # on-device segment well under the tunneled runtime's watchdog
        cfg = GQMAPConfig.full_mixture(data_term="bicubic", quad_chunk=27,
                                       dtype="float32", its=2000, eval_every=25)
        ac.run_one("abfull_bicubic", cfg, "Teddy", seed=0)
        mark("abfull")

    if run("abhalf"):
        base = dict(dtype="float32", its=2000, eval_every=100)
        # the improving-workload arm (RubberWhale @0.5 clearly beats its
        # init within 2000 its) AND a stereo-scale arm (Teddy @0.5)
        for seed in (0, 1, 2):
            cfg = GQMAPConfig.full_mixture(
                data_term="cosine", cheb_p=96, cheb_q=16,
                edge_quad="reduced", **base)
            ac.run_one("abhalf_cosine", cfg, "RubberWhale", scale=0.5, seed=seed)
        cfg = GQMAPConfig.full_mixture(data_term="bicubic", quad_chunk=27, **base)
        ac.run_one("abhalf_bicubic", cfg, "RubberWhale", scale=0.5, seed=0)
        for seed in (0,):
            cfg = GQMAPConfig.full_mixture(
                data_term="cosine", cheb_p=192, cheb_q=12,
                edge_quad="reduced", **base)
            ac.run_one("abhalf_cosine", cfg, "Teddy", scale=0.5, seed=seed)
            cfg = GQMAPConfig.full_mixture(data_term="bicubic", quad_chunk=27, **base)
            ac.run_one("abhalf_bicubic", cfg, "Teddy", scale=0.5, seed=seed)
        mark("abhalf")

    if run("lam-cones"):
        lam_sweep("Cones", [1.0, 2.0, 3.5, 5.0, 7.0, 10.0, 14.0, 20.0])
        mark("lam-cones")

    print("[r04] campaign complete", flush=True)


if __name__ == "__main__":
    main(set(sys.argv[1].split(",")) if len(sys.argv) > 1 else None)
