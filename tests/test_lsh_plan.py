"""lsh_plan / lsh_candidate_probability: driver-side banding math.

Pure arithmetic (no SparkSession) — pins the S-curve model and the
planner's selection invariants so `lsh_plan(...)` output can be splatted
into lsh_candidate_pairs/minhash_lsh_dedup without re-deriving LSH theory
at every call site.
"""

import math

import pytest

from duckdb_ddsketch_spark.operators.dedup import (
    lsh_candidate_probability,
    lsh_plan,
)


def test_probability_endpoints_and_monotonicity():
    for b, r in [(4, 4), (8, 2), (1, 16), (16, 1)]:
        assert lsh_candidate_probability(0.0, b, r) == 0.0
        assert lsh_candidate_probability(1.0, b, r) == 1.0
        prev = -1.0
        for i in range(101):
            p = lsh_candidate_probability(i / 100.0, b, r)
            assert p >= prev
            prev = p


def test_probability_closed_form_r1():
    # r=1: P(s) = 1-(1-s)^b exactly
    for b in (1, 4, 13):
        for s in (0.0, 0.25, 0.5, 0.9):
            assert lsh_candidate_probability(s, b, 1) == pytest.approx(
                1.0 - (1.0 - s) ** b
            )


def test_plan_factorizes_pinned_width():
    plan = lsh_plan(0.5, num_hashes=16)
    assert plan["bands"] * plan["rows_per_band"] == 16
    assert plan["num_hashes"] == 16
    assert 0.0 < plan["threshold_est"] < 1.0
    assert 0.0 <= plan["fp_mass"] <= 1.0 and 0.0 <= plan["fn_mass"] <= 1.0
    # the realized midpoint is the textbook (1/b)^(1/r)
    assert plan["threshold_est"] == pytest.approx(
        (1.0 / plan["bands"]) ** (1.0 / plan["rows_per_band"])
    )


def test_plan_unpinned_width_bounded_and_divisible():
    plan = lsh_plan(0.7, max_hashes=32)
    assert 2 <= plan["num_hashes"] <= 32
    assert plan["bands"] * plan["rows_per_band"] == plan["num_hashes"]


def test_plan_threshold_monotone():
    # a higher target threshold must not pick a LOWER-threshold banding
    lo = lsh_plan(0.2, num_hashes=32)
    hi = lsh_plan(0.9, num_hashes=32)
    assert lo["threshold_est"] <= hi["threshold_est"]


def test_plan_fn_weight_buys_recall():
    # pricing misses higher can only push the choice toward lower fn_mass
    cheap = lsh_plan(0.6, num_hashes=24, fn_weight=0.25)
    dear = lsh_plan(0.6, num_hashes=24, fn_weight=20.0)
    assert dear["fn_mass"] <= cheap["fn_mass"]


def test_plan_fp_mass_matches_closed_form_r1():
    # force r=1 by num_hashes prime and fn_weight tiny enough? simpler:
    # verify the quadrature itself against the r=1 closed form
    b, t, grid = 6, 0.4, 2048
    fp_quad = sum(
        lsh_candidate_probability((i + 0.5) / grid, b, 1)
        for i in range(grid)
        if (i + 0.5) / grid < t
    ) / grid
    fp_exact = t - (1.0 - (1.0 - t) ** (b + 1)) / (b + 1)
    assert fp_quad == pytest.approx(fp_exact, abs=1e-3)


def test_plan_validates_inputs():
    with pytest.raises(ValueError):
        lsh_plan(0.0)
    with pytest.raises(ValueError):
        lsh_plan(1.0)
    with pytest.raises(ValueError):
        lsh_plan(0.5, fn_weight=0.0)


def test_plan_wider_budget_never_scores_worse():
    # the planner's own cost (fp + w*fn) at width 64 must be <= width 8:
    # steeper S-curves dominate — pinning this guards the doc claim
    w = 3.0
    p8 = lsh_plan(0.5, num_hashes=8, fn_weight=w)
    p64 = lsh_plan(0.5, num_hashes=64, fn_weight=w)
    cost8 = p8["fp_mass"] + w * p8["fn_mass"]
    cost64 = p64["fp_mass"] + w * p64["fn_mass"]
    assert cost64 <= cost8 + 1e-12


def test_plan_midpoint_is_half_probability():
    # at s = (1/b)^(1/r) the S-curve sits near its inflection:
    # P = 1-(1-1/b)^b in (1-1/e*? ) — exact value, pin it
    plan = lsh_plan(0.5, num_hashes=16)
    b, r = plan["bands"], plan["rows_per_band"]
    p_mid = lsh_candidate_probability(plan["threshold_est"], b, r)
    assert p_mid == pytest.approx(1.0 - (1.0 - 1.0 / b) ** b)
    # for any b >= 1 that value lives in [1-1/e-ish, 1): sanity band
    assert 0.5 <= p_mid < 1.0 or b == 1


def test_plan_validates_width_inputs():
    # num_hashes/max_hashes < 2 leave no usable factorization (n=1 forces
    # b=r=1 with threshold_est 1.0; n<=0 empties the search entirely)
    for bad in (0, 1, -3):
        with pytest.raises(ValueError):
            lsh_plan(0.5, num_hashes=bad)
    with pytest.raises(ValueError):
        lsh_plan(0.5, max_hashes=1)


def test_plan_kwargs_subdict_is_splat_safe():
    import inspect

    from duckdb_ddsketch_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_lsh_dedup,
    )

    plan = lsh_plan(0.6, num_hashes=16)
    assert plan["kwargs"] == {
        "num_hashes": plan["num_hashes"],
        "bands": plan["bands"],
    }
    for fn in (lsh_candidate_pairs, minhash_lsh_dedup):
        params = inspect.signature(fn).parameters
        assert set(plan["kwargs"]) <= set(params)


def test_planned_banding_beats_misplanned_end_to_end(spark):
    """Drive lsh_candidate_pairs with the planned banding vs a deliberately
    mis-planned one (b=1: threshold_est -> 1.0) on a corpus with known
    ~0.6-Jaccard near-dup pairs: the planned banding must surface
    (strictly) more of the true pairs. Smoke scale — promotes the
    previously session-only end-to-end check into the suite."""
    from duckdb_ddsketch_spark.operators.dedup import lsh_candidate_pairs

    words = [f"tok{i}" for i in range(40)]
    rows = []
    # 30 doc pairs: (2k, 2k+1) share ~70% of an 18-word sequence ->
    # bigram-shingle Jaccard well above 0.5 but far below 1.0
    for k in range(30):
        base = [words[(k * 7 + j) % 40] for j in range(18)]
        var = list(base)
        var[3] = words[(k * 11 + 1) % 40]
        var[9] = words[(k * 13 + 2) % 40]
        var[15] = words[(k * 17 + 3) % 40]
        rows.append((2 * k, " ".join(base)))
        rows.append((2 * k + 1, " ".join(var)))
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    plan = lsh_plan(0.5, num_hashes=16)

    def true_pairs_found(num_hashes, bands):
        got = lsh_candidate_pairs(
            df, text="text", id_col="doc_id", num_hashes=num_hashes, bands=bands
        ).collect()
        cand = {(r["id_a"], r["id_b"]) for r in got}
        return sum(1 for k in range(30) if (2 * k, 2 * k + 1) in cand)

    planned = true_pairs_found(**plan["kwargs"])
    # mis-planned: one band of 16 rows -> needs ALL 16 minhashes to agree,
    # an effective threshold of (1/1)^(1/16) = 1.0 (near-exact dups only)
    misplanned = true_pairs_found(num_hashes=16, bands=1)
    assert planned > misplanned
    assert planned >= 25  # the planner's banding has real recall here
