"""Round-5 tail #2: runs after r05_tail.py drains. Two jobs remain from
VERDICT r04 item 2 (full-res exact-vs-cosine parity A/B):

* abq-*    — extend the quarter-scale A/B matrix from RubberWhale-only to
  the demanded 3 sequences (add Dimetrodon, Grove2) at matched config /
  iterations / seeds. Arm configs are identical to campaign_r04's `seeds`
  stage (which only its RubberWhale cells ever ran); run_one's
  (tag, seq, scale, seed) dedup makes each cell idempotent. Cosine cells
  are seconds each; bicubic cells ~13.5 min, so they are split into
  per-cell ledger steps ordered seed-0-first — partial completion still
  yields a balanced seed-0 row per sequence.

* abfull-bic400 — the full-res exact arm, TRUNCATED. The original
  2000-it Teddy bicubic arm (~85 min at ~2.5 s/sweep complex-packed) was
  killed ~40% in by a TPU worker fault ("kernel fault" per the runtime;
  results/campaign/r05_log.txt tail). Re-running 2000 its does not fit
  the remaining round budget and risks a second fault ending the queue,
  so this records a 400-it arm (tag `abfull400_bicubic`) instead; the
  matched comparison reads the abfull_cosine trace at iteration 400
  (abfull_cosine_Teddy.npz stores per-iteration AEPE). It runs BEFORE
  the quarter-scale bicubic cells (it is the higher-value arm) but after
  the cheap cosine cells, so a repeat fault costs the least possible.

Reference workload being A/B'd: optical_flow.m:16-27 (full-res Teddy,
the exact bicubic-interpolated data term of gqmap_gpu_mixture.m:156-179
vs this repo's characteristic-function cosine approximation).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "results", "campaign")
LEDGER = os.path.join(OUT, "r05_tail2_done.json")


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
        print(f"[tail2] skip {name} (ledger)", flush=True)
        return False
    print(f"[tail2] === {name} === {time.strftime('%H:%M:%S')}", flush=True)
    return True


def main(only=None):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.jax_cache"))
    from gqmap_tpu.config import GQMAPConfig

    import accuracy_campaign as ac

    base = dict(dtype="float32", its=2000, eval_every=100)
    cos_cfg = GQMAPConfig.full_mixture(data_term="cosine", cheb_p=96,
                                       cheb_q=16, edge_quad="reduced", **base)
    bic_cfg = GQMAPConfig.full_mixture(data_term="bicubic", quad_chunk=27,
                                       **base)

    if step("abq-cos", only):
        for seq in ("Dimetrodon", "Grove2"):
            for seed in (0, 1, 2):
                ac.run_one("ab_cosine", cos_cfg, seq, scale=0.25, seed=seed)
        mark("abq-cos")

    if step("abfull-bic400", only):
        cfg = GQMAPConfig.full_mixture(data_term="bicubic", quad_chunk=27,
                                       dtype="float32", its=400,
                                       eval_every=25)
        ac.run_one("abfull400_bicubic", cfg, "Teddy", seed=0)
        mark("abfull-bic400")

    # bicubic cells: one ledger step each, seed-0 cells first
    cells = [(seq, seed) for seed in (0, 1, 2)
             for seq in ("Dimetrodon", "Grove2")]
    for seq, seed in cells:
        name = f"abq-bic-{seq.lower()}{seed}"
        if step(name, only):
            ac.run_one("ab_bicubic", bic_cfg, seq, scale=0.25, seed=seed)
            mark(name)

    print("[tail2] done", flush=True)


if __name__ == "__main__":
    main(set(sys.argv[1].split(",")) if len(sys.argv) > 1 else None)
