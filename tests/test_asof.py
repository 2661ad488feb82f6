"""As-of join operator golden tests (hand-built small cases — SURVEY.md
§7 hard-point 6)."""

from __future__ import annotations

from free_etl_spark.operators.asof import asof_join_backward


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, 10, "p1"), (1, 20, "p2"), (2, 15, "p3"), (3, 5, "p4")],
        "uid int, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 12, 200.0), (2, 15, 300.0), (4, 1, 400.0)],
        "uid int, rts long, val double",
    )
    out = asof_join_backward(
        left, right, on=["uid"], left_ts="ts", right_ts="rts", payload_cols=["val"]
    )
    got = {r["tag"]: (r["asof_rts"], r["asof_val"]) for r in out.collect()}
    assert got["p1"] == (5, 100.0)      # latest rts <= 10 is 5
    assert got["p2"] == (12, 200.0)     # latest rts <= 20 is 12
    assert got["p3"] == (15, 300.0)     # equal timestamps match (<= semantics)
    assert got["p4"] == (None, None)    # no preceding right row → NULL
    assert out.count() == 4             # left-preserving


def test_asof_multiple_left_rows_share_match(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12)], "uid int, ts long"
    )
    right = spark.createDataFrame([(1, 9, "x")], "uid int, rts long, tag string")
    out = asof_join_backward(
        left, right, on=["uid"], left_ts="ts", right_ts="rts", payload_cols=["tag"]
    )
    assert [r["asof_tag"] for r in out.collect()] == ["x", "x", "x"]
