"""Render results/campaign/*.jsonl as the BASELINE.md accuracy tables."""

import json
import os
import sys

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "campaign")


def rows(path):
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def main():
    camp = [r for r in rows(os.path.join(OUT, "campaign.jsonl"))
            if "-smoke" not in r["tag"]]
    var = [r for r in rows(os.path.join(OUT, "variants.jsonl"))
           if "-smoke" not in r["tag"]]

    print("### Campaign (reference driver configs)\n")
    print("| Tag | Sequence | best AEPE | @iter | ms/sweep | config |")
    print("|---|---|---|---|---|---|")
    for r in camp:
        cfgs = (f"K={r['K']} L={r['L']} patch={r['patch']} {r['data_term']} "
                f"P={r['cheb_p']} Q={r['cheb_q']} T={r['temperature']}")
        print(f"| {r['tag']} | {r['seq']}@{r['scale']} | {r['best_aepe']:.4f} "
              f"| {r['best_at']} | {r['ms_per_sweep']} | {cfgs} |")

    if var:
        print("\n### Best-variant hunt (Teddy/Cones)\n")
        print("| Variant | Sequence | best AEPE | @iter | init | config |")
        print("|---|---|---|---|---|---|")
        for r in var:
            cfgs = (f"K={r['K']} L={r['L']} patch={r['patch']} "
                    f"P={r['cheb_p']} Q={r['cheb_q']} T={r['temperature']}")
            print(f"| {r['tag']} | {r['seq']} | {r['best_aepe']:.4f} "
                  f"| {r['best_at']} | {r['init']} | {cfgs} |")

    # cosine-vs-exact delta (stage C)
    ab = {r["tag"]: r for r in camp if r["tag"].startswith("ab_")}
    if "ab_bicubic" in ab and "ab_cosine" in ab:
        d = ab["ab_cosine"]["best_aepe"] - ab["ab_bicubic"]["best_aepe"]
        rel = d / ab["ab_bicubic"]["best_aepe"] * 100
        print(f"\ncosine-vs-exact AEPE delta (RubberWhale@0.25, matched "
              f"iters/seed): {d:+.4f} ({rel:+.1f}%)")


if __name__ == "__main__":
    main()
