"""asof_join / sessionize / range_band_join semantics, verified against
brute-force references on synthetic frames (and, in the declared queries,
against DuckDB ASOF JOIN / window SQL — tests here pin the edge cases)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from duckdb_ddsketch_spark.operators import relational

UTC = dt.timezone.utc


def ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second, tzinfo=UTC)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, ts(10), "l1"),
            (1, ts(20), "l2"),
            (2, ts(5), "l3"),
            (3, ts(30), "l4"),  # key with no right rows
        ],
        "k long, ts timestamp, lbl string",
    )
    right = spark.createDataFrame(
        [
            (1, ts(10), 100.0),  # ties l1 exactly
            (1, ts(15), 150.0),
            (2, ts(6), 60.0),  # after l3
        ],
        "k long, ts timestamp, v double",
    )
    return left, right


def test_asof_backward(spark, frames):
    left, right = frames
    out = {
        r.lbl: (r.ts_r, r.v)
        for r in relational.asof_join(left, right, ["k"]).collect()
    }
    assert out["l1"] == (ts(10).replace(tzinfo=None), 100.0)  # inclusive tie
    assert out["l2"] == (ts(15).replace(tzinfo=None), 150.0)  # latest <=
    assert out["l3"] == (None, None)  # right row is after
    assert out["l4"] == (None, None)  # no right rows for key


def test_asof_forward(spark, frames):
    left, right = frames
    out = {
        r.lbl: (r.ts_r, r.v)
        for r in relational.asof_join(
            left, right, ["k"], direction="forward"
        ).collect()
    }
    assert out["l1"] == (ts(10).replace(tzinfo=None), 100.0)  # inclusive tie
    assert out["l2"] == (None, None)  # nothing after
    assert out["l3"] == (ts(6).replace(tzinfo=None), 60.0)  # earliest >=


def test_asof_column_collision_gets_suffix(spark, frames):
    left, right = frames
    j = relational.asof_join(
        left.withColumn("v", F.lit(0.0)), right, ["k"]
    )
    assert "v_r" in j.columns and "v" in j.columns


def test_asof_explicit_right_cols_including_ts_not_ambiguous(spark, frames):
    """Code-review r8 pass 3: listing the right timestamp in an explicit
    right_cols emitted TWO columns under the same name (the __rts slot
    plus the loop's copy) — every downstream reference then raised
    AMBIGUOUS_REFERENCE. The match timestamp is always emitted; an
    explicit list must exclude it like the None default does."""
    left, right = frames
    j = relational.asof_join(left, right, ["k"], right_cols=["ts", "v"])
    assert j.columns.count("ts_r") == 1
    # and it still carries the matched values
    got = {r.k: r.v for r in j.collect() if r.v is not None}
    assert got  # at least one backward match exists in the fixture


def test_sessionize_gaps_and_ties(spark):
    rows = [
        (1, ts(0), 1),
        (1, ts(0), 2),      # exact tie -> same session, tiebreak keeps order stable
        (1, ts(10), 3),     # 10 min <= 30 min gap -> same session
        (1, ts(50), 4),     # 40 min > 30 -> new session
        (2, ts(0), 5),      # separate key
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, eid long")
    out = {
        r.eid: r.session_idx
        for r in relational.sessionize(
            df, ["k"], "ts", gap_seconds=1800, tiebreak="eid"
        ).collect()
    }
    assert out[1] == out[2] == out[3] == 0
    assert out[4] == 1
    assert out[5] == 0


def test_sessionize_gap_is_strict(spark):
    df = spark.createDataFrame(
        [(1, ts(0), 1), (1, ts(30), 2)], "k long, ts timestamp, eid long"
    )
    out = {
        r.eid: r.session_idx
        for r in relational.sessionize(
            df, ["k"], "ts", gap_seconds=1800, tiebreak="eid"
        ).collect()
    }
    # gap == 1800s exactly: NOT a new session (strict >)
    assert out[1] == out[2] == 0


def test_range_band_join_matches_naive(spark):
    import random

    rng = random.Random(7)
    lrows = [(i, ts(0) + dt.timedelta(seconds=rng.randint(0, 3600))) for i in range(80)]
    rrows = [(i, ts(0) + dt.timedelta(seconds=rng.randint(0, 3600))) for i in range(80)]
    left = spark.createDataFrame(lrows, "lid long, ts timestamp")
    right = spark.createDataFrame(rrows, "rid long, ts timestamp")
    got = {
        (r.lid, r.rid)
        for r in relational.range_band_join(
            left, right, "ts", "ts", 0.0, 120.0
        ).collect()
    }
    naive = {
        (l.lid, r.rid)
        for l in left.collect()
        for r in right.collect()
        if 0 <= (r.ts - l.ts).total_seconds() <= 120
    }
    assert got == naive


def test_range_band_join_with_keys_and_negative_band(spark):
    left = spark.createDataFrame(
        [(1, 10, ts(10)), (1, 11, ts(20))], "k long, lid long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, ts(9)), (1, ts(11)), (2, ts(10))], "k long, ts timestamp"
    )
    got = {
        (r.lid, r.ts_r)
        for r in relational.range_band_join(
            left, right, "ts", "ts", -120.0, 120.0, on=["k"]
        ).collect()
    }
    # key 2's right row never matches key 1's probes; both of key 1's
    # right rows fall within +/-2 min of l10 only
    assert got == {
        (10, ts(9).replace(tzinfo=None)),
        (10, ts(11).replace(tzinfo=None)),
    }


def test_asof_matches_bruteforce_randomized(spark):
    """Both directions x bare/payload paths against an O(n*m) reference.

    Right (k, ts) pairs are unique so the matched payload is well-defined
    even where several right rows tie a left timestamp."""
    import random

    rng = random.Random(42)
    lrows = [(rng.randint(0, 5), rng.randint(0, 1000)) for _ in range(300)]
    rpairs = rng.sample(
        [(k, t) for k in range(6) for t in range(1001)], 200
    )
    rrows = [(k, t, k * 10000 + t) for k, t in rpairs]
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)], "lid long, k long, ts long"
    )
    right = spark.createDataFrame(rrows, "k long, ts long, rv long")

    for direction in ("backward", "forward"):
        for cols in ([], ["rv"]):
            got = {
                r.lid: (r.ts_r, r.rv if cols else None)
                for r in relational.asof_join(
                    left,
                    right,
                    ["k"],
                    right_cols=cols,
                    direction=direction,
                ).collect()
            }
            for lid, (k, t) in enumerate(lrows):
                if direction == "backward":
                    cand = [(rt, rv) for rk, rt, rv in rrows if rk == k and rt <= t]
                    exp = max(cand, default=(None, None))
                else:
                    cand = [(rt, rv) for rk, rt, rv in rrows if rk == k and rt >= t]
                    exp = min(cand, default=(None, None))
                exp_ts, exp_rv = exp
                assert got[lid][0] == exp_ts, (direction, cols, lid)
                if cols:
                    assert got[lid][1] == exp_rv, (direction, cols, lid)


def test_asof_plan_single_shuffle_per_side(spark, frames):
    """The union-tag-window form must not contain a join operator."""
    left, right = frames
    plan = (
        relational.asof_join(left, right, ["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert "Window" in plan


# ---------------------------------------------------------------------------
# gapfill_locf
# ---------------------------------------------------------------------------


def test_gapfill_locf_fills_interior_gaps(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("a", 5, 50.0), ("b", 3, 30.0)],
        "k string, day int, v double",
    )
    out = relational.gapfill_locf(df, ["k"], "day", ["v"])
    rows = {(r.k, r.day): r for r in out.collect()}
    # dense axis per key, bounded by that key's min/max
    assert sorted(d for k, d in rows if k == "a") == [1, 2, 3, 4, 5]
    assert sorted(d for k, d in rows if k == "b") == [3]
    # synthesized rows: NULL raw, LOCF fill, flagged
    assert rows[("a", 3)].v is None
    assert rows[("a", 3)].v_filled == 20.0
    assert rows[("a", 4)].v_filled == 20.0
    assert rows[("a", 3)].gap_filled == 1
    # observed rows keep their value and flag 0
    assert rows[("a", 5)].v == 50.0 and rows[("a", 5)].gap_filled == 0
    assert rows[("b", 3)].gap_filled == 0


def test_gapfill_locf_multiple_measures_and_leading_nulls(spark):
    df = spark.createDataFrame(
        [("k", 10, None, 1.0), ("k", 12, 5.0, None)],
        "k string, day int, a double, b double",
    )
    out = relational.gapfill_locf(df, ["k"], "day", ["a", "b"])
    rows = {r.day: r for r in out.collect()}
    assert sorted(rows) == [10, 11, 12]
    # leading NULL measure stays NULL through the fill (nothing to carry)
    assert rows[10].a_filled is None
    assert rows[11].a_filled is None
    assert rows[12].a_filled == 5.0
    # second measure carries independently
    assert rows[11].b_filled == 1.0 and rows[12].b_filled == 1.0
    # the day-11 row is synthetic; day 10 and 12 are observed even though
    # they contain NULL measures
    assert rows[11].gap_filled == 1
    assert rows[10].gap_filled == 0 and rows[12].gap_filled == 0


def test_asof_preserves_left_ts_dtype_on_union_widening(spark):
    """When left_ts and right_ts have different union-coercible types
    (int vs bigint), unionByName widens the internal __t column; the
    output left_ts must be restored to the LEFT input's declared dtype
    with values intact."""
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b")], "k long, ts int, lbl string"
    )
    right = spark.createDataFrame(
        [(1, 5), (1, 15)], "k long, ts bigint"
    )
    out = relational.asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", right_cols=[]
    )
    assert dict(out.dtypes)["ts"] == "int"
    got = {(r.k, r.ts): r.ts_r for r in out.collect()}
    assert got == {(1, 10): 5, (1, 20): 15}
