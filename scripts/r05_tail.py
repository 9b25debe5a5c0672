"""Round-5 tail: the post-abfull TPU jobs, trimmed to the remaining
wall-clock and re-ordered by VERDICT value (run after campaign_r05.py's
queue exits; its lam-cones/lam-best/rb2/ctfflag/f32cond/seeds steps were
ledger-marked so the long bicubic arm could finish first).

Economies vs the original steps, each recorded in BASELINE:

* lam-cones: 4 values bracketing the Teddy winner — the lambda_s=5.0
  point already exists as the r03 `bm` Cones variant row (identical
  config: tpu_fast 192x12, blockmatch init, 10000 its, seed 0 -> 4.651).
* rb2: only the REDBLACK arms run; the matched Jacobi arms already exist
  (Teddy: the 192x12 frontier point, same cfg/init/seed/its -> 5.2265;
  Hydrangea super: the stage-B campaign row at 30000 its -> 0.2045).
* lam-best: Teddy lambda=1.0 at the full 30000-it budget first (the
  known winner), Cones' winner after — lowest certainty last.
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "results", "campaign")
LEDGER = os.path.join(OUT, "r05_tail_done.json")


def ledger():
    if os.path.exists(LEDGER):
        with open(LEDGER) as f:
            return set(json.load(f))
    return set()


def mark(step):
    done = ledger() | {step}
    with open(LEDGER, "w") as f:
        json.dump(sorted(done), f)


def step(name, only):
    if only is not None and name not in only:
        return False
    if name in ledger():
        print(f"[tail] skip {name} (ledger)", flush=True)
        return False
    print(f"[tail] === {name} === {time.strftime('%H:%M:%S')}", flush=True)
    return True


def bm_init(seq):
    from best_variants import gt_ranges
    from gqmap_tpu.models.blockmatch import block_matching_init

    minu, maxu, minv, maxv = gt_ranges(seq)
    U = int(math.ceil(max(abs(minv), abs(maxv)))) + 2
    V = int(math.ceil(max(abs(minu), abs(maxu)))) + 2
    return block_matching_init(seq.img1, seq.img2, U=U, V=V)


def main(only=None):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.jax_cache"))
    from gqmap_tpu.config import GQMAPConfig
    from gqmap_tpu.io.dataset import load_sequence

    import accuracy_campaign as ac
    from campaign_r04 import lam_sweep

    if step("lam-cones", only):
        lam_sweep("Cones", [0.7, 1.0, 1.5, 2.5])
        mark("lam-cones")

    if step("rb-teddy", only):
        seq = load_sequence("Teddy")
        cfg = GQMAPConfig.tpu_fast(dtype="float32", cheb_p=192, cheb_q=12,
                                   its=10000, sweep_order="redblack")
        ac.run_one("order_redblack", cfg, "Teddy", init_flow=bm_init(seq))
        mark("rb-teddy")

    if step("rb-super", only):
        cfg = GQMAPConfig.tpu_fast_super(dtype="float32", cheb_p=96,
                                         cheb_q=48, its=30000,
                                         sweep_order="redblack")
        ac.run_one("order_redblack_super", cfg, "Hydrangea")
        mark("rb-super")

    if step("ctfflag", only):
        import subprocess
        cmd = [sys.executable, "-m", "gqmap_tpu.cli.main", "ctf",
               "--seq", "Dimetrodon", "--preset", "ctf_level",
               "--data-term", "cosine", "--cheb-p", "96", "--cheb-q", "16",
               "--level-init", "random", "--quiet"]
        t0 = time.time()
        out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not lines:
            print(out.stdout[-2000:], out.stderr[-2000:], flush=True)
            raise SystemExit("ctf CLI produced no JSON")
        rec = json.loads(lines[-1])
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
        import subprocess
        rc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "f32_conditioning.py")],
            cwd=REPO).returncode
        if rc == 0:
            mark("f32cond")
        else:
            print(f"[tail] f32cond failed rc={rc}", flush=True)

    if step("lam-best-teddy", only):
        lam_sweep("Teddy", [1.0], its=30000)
        mark("lam-best-teddy")

    if step("roofline", only):
        import subprocess
        rc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "roofline_r05.py")],
            cwd=REPO).returncode
        if rc == 0:
            mark("roofline")

    if step("frontier48", only):
        # the one untested frontier corner: A=48 at the load-bearing B=16
        # (every failing 48-class point was at B<=12). Evidence-only — a
        # further 1.33x candidate for the NEXT adoption cycle, not adopted
        # this round (adoption requires its own 30000-it verification).
        from campaign_r05 import frontier_run

        for seq in ("RubberWhale", "Dimetrodon"):
            frontier_run(seq, 48, 16)
        mark("frontier48")

    if step("lam-best-cones", only):
        rows = {}
        with open(os.path.join(OUT, "lambda_sweep.jsonl")) as f:
            for line in f:
                r = json.loads(line)
                if r["seq"] == "Cones" and r.get("its") == 10000:
                    rows[r["lambdas"]] = r["best_aepe"]
        rows.setdefault(5.0, 4.651)  # the r03 bm variant row
        best = min(rows, key=rows.get)
        lam_sweep("Cones", [float(best)], its=30000)
        mark("lam-best-cones")

    if step("seeds-rw2", only):
        cfg = GQMAPConfig.full_mixture(data_term="bicubic", quad_chunk=27,
                                       dtype="float32", its=2000,
                                       eval_every=100)
        ac.run_one("ab_bicubic", cfg, "RubberWhale", scale=0.25, seed=2)
        mark("seeds-rw2")

    print("[tail] done", flush=True)


if __name__ == "__main__":
    main(set(sys.argv[1].split(",")) if len(sys.argv) > 1 else None)
