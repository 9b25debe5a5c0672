"""Results contract: the committed campaign artifacts stay complete + sane.

Locks the headline numbers of `results/campaign/campaign.jsonl` (VERDICT r2
item 1): the full reference suite must be present — stage A (Teddy, Cones,
30000 its), stage B (all five super sequences), stage C (the data-term A/B)
— and each recorded best AEPE must stay at or below the recorded
measurement plus ~3% slack. Regenerating the campaign with a solver
regression fails here, loudly.

r05 (VERDICT r04 item 8 / ADVICE): rows are keyed by (tag, seq, seed) —
multi-seed reruns no longer silently overwrite which row the lock checks —
and EVERY committed seed is pinned, plus the r04 sweep-order A/B, the
preprocessed super rows, and the lambda-sweep artifact.
"""

import json
import os

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(HERE, "results", "campaign", "campaign.jsonl")
LAM_PATH = os.path.join(HERE, "results", "campaign", "lambda_sweep.jsonl")

# (tag, seq, seed) -> (max best_aepe, min iters); thresholds = recorded
# value + ~3% slack (r04 values unless noted).
EXPECTED = {
    ("full_cosine", "Teddy", 0): (5.37, 30000),       # r04: 5.2061
    ("full_cosine", "Cones", 0): (4.60, 30000),       # r04: 4.4576
    ("full_cosine", "RubberWhale", 0): (0.237, 30000),  # r04: 0.2292
    ("full_cosine", "Dimetrodon", 0): (0.274, 30000),   # r04: 0.2657
    ("full_cosine", "Grove2", 0): (0.444, 30000),       # r04: 0.4301
    # r05 flagship re-pick verification: 64x16 degrees at the full budget
    # must keep matching the 96x16 rows (the basis for tpu_fast's default)
    ("flag64x16_cosine", "RubberWhale", 0): (0.237, 30000),  # r05: 0.2299
    ("flag64x16_cosine", "Dimetrodon", 0): (0.274, 30000),   # r05: 0.2661
    ("flag64x16_cosine", "Grove2", 0): (0.443, 30000),       # r05: 0.4300
    ("super_cosine", "Venus", 0): (0.86, 30000),      # r04: 0.8333
    ("super_cosine", "Hydrangea", 0): (0.211, 30000), # r04: 0.2045
    ("super_cosine", "Urban2", 0): (2.87, 30000),     # r04: 2.7813
    ("super_cosine", "Urban3", 0): (1.67, 30000),     # r04: 1.6184
    ("super_cosine", "Grove3", 0): (3.17, 30000),     # r04: 3.0752
    ("super_cosine_pre", "RubberWhale", 0): (0.131, 30000),  # r04: 0.1263
    ("super_cosine_pre", "Dimetrodon", 0): (0.234, 30000),   # r04: 0.2265
    ("super_cosine_pre", "Hydrangea", 0): (0.228, 30000),    # r04: 0.2206
    ("super_cosine_pre", "Venus", 0): (1.77, 30000),         # r04: 1.7142
    ("ab_bicubic", "RubberWhale", 0): (0.55, 2000),   # r04: 0.5293
    ("ab_bicubic", "RubberWhale", 1): (0.54, 2000),   # r04: 0.5225
    ("ab_nearest", "RubberWhale", 0): (0.55, 2000),   # r04: 0.5293
    ("ab_chebyshev", "RubberWhale", 0): (0.55, 2000), # r04: 0.5275
    ("ab_cosine", "RubberWhale", 0): (0.535, 2000),   # r04: 0.5187
    ("ab_cosine", "RubberWhale", 1): (0.532, 2000),   # r04: 0.5161
    ("ab_cosine", "RubberWhale", 2): (0.526, 2000),   # r04: 0.5104
    # r04 sweep-order A/B (VERDICT r04 item 8): the red-black half-sweeps
    # must keep beating Jacobi at matched sweep count on this workload.
    ("order_jacobi", "RubberWhale", 0): (0.463, 6000),    # r04: 0.4490
    ("order_redblack", "RubberWhale", 0): (0.381, 6000),  # r04: 0.3690
    # r05 sweep-order arms on the other two workload classes (the basis
    # for the "opt-in knob, not default" decision in BASELINE.md): locked
    # as recorded, including the Teddy arm where red-black LOSES.
    ("order_redblack", "Teddy", 0): (6.09, 10000),          # r05: 5.9130
    ("order_redblack_super", "Hydrangea", 0): (0.212, 30000),  # r05: 0.2057
    # r05 full-res exact-vs-cosine parity arms (VERDICT r04 item 2):
    # Teddy full-res, 2000 its from random init (far from converged by
    # design — the matched-iteration comparison regime).
    ("abfull_cosine", "Teddy", 0): (8.41, 2000),  # r05: 8.1629
    ("abfull_cosine", "Teddy", 1): (8.50, 2000),  # r05: 8.2529
    ("abfull_cosine", "Teddy", 2): (8.47, 2000),  # r05: 8.2268
    # r05 quarter-scale A/B extension to 3 sequences (VERDICT r04 item 2).
    # best_aepe at this scale is the shared seeded init (best_at=1); the
    # cosine-vs-bicubic comparison itself is test_cosine_tracks_exact_term.
    ("ab_cosine", "Dimetrodon", 0): (0.357, 2000),   # r05: 0.3460
    ("ab_cosine", "Dimetrodon", 1): (0.354, 2000),   # r05: 0.3431
    ("ab_cosine", "Dimetrodon", 2): (0.353, 2000),   # r05: 0.3421
    ("ab_cosine", "Grove2", 0): (0.388, 2000),       # r05: 0.3763
    ("ab_cosine", "Grove2", 1): (0.384, 2000),       # r05: 0.3721
    ("ab_cosine", "Grove2", 2): (0.386, 2000),       # r05: 0.3743
    ("ab_bicubic", "Dimetrodon", 0): (0.359, 2000),  # r05: 0.3479
}


@pytest.fixture(scope="module")
def campaign():
    if not os.path.exists(PATH):
        pytest.skip("campaign artifact not present")
    rows = {}
    with open(PATH) as f:
        for line in f:
            r = json.loads(line)
            if "-smoke" not in r["tag"]:
                # Re-measurements append; the LAST row per (tag, seq, seed)
                # is the one the lock enforces (the current code path).
                rows[(r["tag"], r["seq"], r.get("seed", 0))] = r
    return rows


def test_campaign_complete(campaign):
    missing = [k for k in EXPECTED if k not in campaign]
    assert not missing, f"campaign rows missing: {missing}"


def test_campaign_headline_numbers(campaign):
    for key, (max_aepe, min_iters) in EXPECTED.items():
        if key not in campaign:
            continue  # completeness asserted above
        r = campaign[key]
        assert r["best_aepe"] <= max_aepe, (key, r["best_aepe"], max_aepe)
        assert r["iters"] >= min_iters, (key, r["iters"], min_iters)


def test_cosine_tracks_exact_term(campaign):
    # the framework's core accuracy claim: the gather-free closed-form term
    # does not degrade accuracy vs the reference's exact bicubic sampler at
    # matched iterations AND matched seed (seed-to-seed pairs, not whichever
    # seed happened to be appended last — ADVICE r04).
    pairs = 0
    for (tag, seq, seed), bi in campaign.items():
        if tag != "ab_bicubic":
            continue
        co = campaign.get(("ab_cosine", seq, seed))
        if co is None:
            continue
        pairs += 1
        assert co["final_aepe"] <= bi["final_aepe"] * 1.05, (seq, seed)
        assert co["best_aepe"] <= bi["best_aepe"] * 1.05, (seq, seed)
    if pairs == 0:
        pytest.skip("no matched-seed A/B pairs present")


def test_lambda_sweep_artifact():
    # legacy/LearnRatio.m's lever, recorded (VERDICT r04 item 8): the Teddy
    # sweep must keep showing lambda_s=1 beating the reference's lambda_s=5
    # choice by the recorded margin (r04: 4.318 vs 5.226 at matched budget).
    if not os.path.exists(LAM_PATH):
        pytest.skip("lambda sweep artifact not present")
    rows = {}
    with open(LAM_PATH) as f:
        for line in f:
            r = json.loads(line)
            rows[(r["seq"], r["lambdas"])] = r
    t1 = rows.get(("Teddy", 1.0))
    t5 = rows.get(("Teddy", 5.0))
    assert t1 and t5, "Teddy lambda rows missing"
    assert t1["best_aepe"] <= 4.45   # r04: 4.318 + ~3%
    assert t5["best_aepe"] <= 5.38   # r04: 5.226 + ~3%
    assert t1["best_aepe"] < t5["best_aepe"]
