"""Results contract: the committed campaign artifact stays complete + sane.

Locks the headline numbers of `results/campaign/campaign.jsonl` (VERDICT r2
item 1): the full reference suite must be present — stage A (Teddy, Cones,
30000 its), stage B (all five super sequences), stage C (the four-way
data-term A/B) — and each recorded best AEPE must stay at or below the
round-3 measurement plus slack. Regenerating the campaign with a solver
regression fails here, loudly.
"""

import json
import os

import pytest

PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "results", "campaign", "campaign.jsonl")

# (tag, seq) -> (max best_aepe, min iters); thresholds = r04 re-measured
# value + ~3% slack (tightened from r03's ~7% per VERDICT r03 weak #6 —
# the r04 rerun on the flat+recur production kernel reproduced or beat
# every r03 number, so a modest solver regression now fails loudly)
EXPECTED = {
    ("full_cosine", "Teddy"): (5.37, 30000),       # r04: 5.2061
    ("full_cosine", "Cones"): (4.60, 30000),       # r04: 4.4576
    ("super_cosine", "Venus"): (0.86, 30000),      # r04: 0.8333
    ("super_cosine", "Hydrangea"): (0.211, 30000), # r04: 0.2045
    ("super_cosine", "Urban2"): (2.87, 30000),     # r04: 2.7813
    ("super_cosine", "Urban3"): (1.67, 30000),     # r04: 1.6184
    ("super_cosine", "Grove3"): (3.17, 30000),     # r04: 3.0752
    ("ab_bicubic", "RubberWhale"): (0.55, 2000),   # r04 seed 0: 0.5293
    ("ab_nearest", "RubberWhale"): (0.55, 2000),
    ("ab_chebyshev", "RubberWhale"): (0.55, 2000),
    ("ab_cosine", "RubberWhale"): (0.54, 2000),    # r04 seed 0: 0.5187
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
                rows[(r["tag"], r["seq"])] = r
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
    # matched iterations/seed
    bi = campaign.get(("ab_bicubic", "RubberWhale"))
    co = campaign.get(("ab_cosine", "RubberWhale"))
    if not (bi and co):
        pytest.skip("A/B rows not present")
    assert co["final_aepe"] <= bi["final_aepe"] * 1.05
    assert co["best_aepe"] <= bi["best_aepe"] * 1.05
