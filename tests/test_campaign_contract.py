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

# (tag, seq) -> (max best_aepe, min iters); thresholds = r03 value + ~7% slack
EXPECTED = {
    ("full_cosine", "Teddy"): (5.6, 30000),
    ("full_cosine", "Cones"): (4.8, 30000),
    ("super_cosine", "Venus"): (0.93, 30000),
    ("super_cosine", "Hydrangea"): (0.23, 30000),
    ("super_cosine", "Urban2"): (3.1, 30000),
    ("super_cosine", "Urban3"): (1.8, 30000),
    ("super_cosine", "Grove3"): (3.3, 30000),
    ("ab_bicubic", "RubberWhale"): (0.57, 2000),
    ("ab_nearest", "RubberWhale"): (0.57, 2000),
    ("ab_chebyshev", "RubberWhale"): (0.57, 2000),
    ("ab_cosine", "RubberWhale"): (0.56, 2000),
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
