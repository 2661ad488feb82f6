"""Invariant + reimplementation pins for the round-7 final-wave
operators (sequence pattern, activity bitmap, blur detect,
silhouette, bitmap distinct, growth accounting)."""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import pytest

from free_etl_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from free_etl_spark.session import get_spark

    return get_spark("test-r7-waves")


def test_sequence_pattern_matches_python_recompute(spark):
    """The MATCH_RECOGNIZE emulation must equal a row-at-a-time
    Python reimplementation: per-user symbol string ordered by
    (ts, event_id), lazy-regex count of v..c..p with no 'e'."""
    ev = (
        pd.read_parquet(f"{SF_DIR}/events.parquet")
        .sort_values(["user_id", "ts", "event_id"])
    )
    pat = re.compile(r"v[^e]*?c[^e]*?p")
    want = {}
    for uid, grp in ev.groupby("user_id"):
        s = "".join(t[0] for t in grp["event_type"])
        n = len(pat.findall(s))
        if n >= 1:
            want[uid] = n
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["user_id"], r["n_matches"])
        for r in QUERIES["events_sequence_pattern"](spark, SF_DIR).collect()
    ]
    assert got == top


def test_activity_bitmap_accounts_every_user(spark):
    """Histogram of bit_count(mask) partitions the distinct-user set,
    and no user can be active more days than the corpus spans."""
    rows = QUERIES["events_activity_bitmap"](spark, SF_DIR).collect()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    n_users = ev["user_id"].nunique()
    span_days = (ev["ts"].dt.date.max() - ev["ts"].dt.date.min()).days + 1
    assert sum(r["n_users"] for r in rows) == n_users
    assert all(1 <= r["n_active_days"] <= span_days for r in rows)
    assert all(0 <= r["n_both_halves"] <= r["n_users"] for r in rows)


def test_blur_detect_matches_hashlib_recompute(spark):
    """The JVM md5 pixel plane + Laplacian must equal a hashlib
    reimplementation for every document (exact integer math)."""
    got = {
        r["doc_id"]: r["lap_var"]
        for r in QUERIES["multimodal_blur_detect"](spark, SF_DIR).collect()
    }
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    import math

    for _, row in docs.head(25).iterrows():
        digest = hashlib.md5(
            (row["text"] + "|dhash9x8").encode()
        ).hexdigest()
        px = [int(digest[2 * (i % 16): 2 * (i % 16) + 2], 16) for i in range(72)]
        lap = [
            4 * px[r * 9 + c]
            - px[(r - 1) * 9 + c]
            - px[(r + 1) * 9 + c]
            - px[r * 9 + c - 1]
            - px[r * 9 + c + 1]
            for r in range(1, 7)
            for c in range(1, 8)
        ]
        s1 = float(sum(lap))
        s2 = float(sum(x * x for x in lap))
        var = (s2 - s1 * s1 / 42.0) / 42.0
        assert got[row["doc_id"]] == math.floor(var * 1e6) / 1e6


def test_silhouette_bounded_and_covers_labels(spark):
    rows = QUERIES["emb_silhouette"](spark, SF_DIR).collect()
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    assert {r["label"] for r in rows} == set(emb["label"].unique())
    assert sum(r["n_vecs"] for r in rows) == len(emb)
    assert all(-1.0 <= r["avg_silhouette"] <= 1.0 for r in rows)


def test_bitmap_distinct_equals_exact(spark):
    rows = QUERIES["agg_bitmap_distinct"](spark, SF_DIR).collect()
    assert rows and all(r["bitmap_matches_exact"] for r in rows)
    assert all(r["n_users_bitmap"] == r["n_users_exact"] for r in rows)


def test_growth_accounting_conserves_users(spark):
    """Per week: new + retained + resurrected = distinct active users
    that week (churned rows describe the FOLLOWING week's loss)."""
    rows = QUERIES["events_growth_accounting"](spark, SF_DIR).collect()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    base = pd.Timestamp("2024-01-01").date()
    wk = ev["ts"].dt.date.map(lambda d: (d - base).days // 7)
    active = (
        pd.DataFrame({"user_id": ev["user_id"], "wk": wk})
        .drop_duplicates()
        .groupby("wk")["user_id"]
        .nunique()
    )
    per_week: dict[int, int] = {}
    for r in rows:
        if r["state"] != "churned":
            per_week[r["wk"]] = per_week.get(r["wk"], 0) + r["n_users"]
    assert per_week == active.to_dict()


def test_mann_whitney_matches_python_recompute(spark):
    """U and z must match a direct tie-corrected reimplementation
    over the same parquet (rank math exactness claim)."""
    import math

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    sub = ev[ev["event_type"].isin(["click", "purchase"])]
    vals = sorted(sub["value"].unique())
    cum = 0
    avg_rank = {}
    cnt = sub.groupby("value").size().to_dict()
    cnt_a = (
        sub[sub["event_type"] == "click"].groupby("value").size().to_dict()
    )
    for v in vals:
        c = cnt[v]
        avg_rank[v] = cum + (c + 1) / 2.0
        cum += c
    n_a = sum(cnt_a.values())
    n = len(sub)
    n_b = n - n_a
    s_a = sum(cnt_a.get(v, 0) * avg_rank[v] for v in vals)
    u_a = s_a - n_a * (n_a + 1) / 2.0
    mu = n_a * n_b / 2.0
    t_ties = sum(c**3 - c for c in cnt.values())
    var = (n_a * n_b / 12.0) * ((n + 1) - t_ties / (n * (n - 1.0)))
    z = math.floor((u_a - mu) / math.sqrt(var) * 1e6) / 1e6
    row = QUERIES["events_mann_whitney"](spark, SF_DIR).collect()[0]
    assert row["n_a"] == n_a and row["n_b"] == n_b
    assert row["u_stat"] == u_a
    assert row["z"] == z


def test_skyline_is_exact_pareto_frontier(spark):
    """Every returned order must be non-dominated on (price, date)
    and every non-dominated order must be returned."""
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    pts = list(
        zip(o["o_orderkey"], o["o_totalprice"], o["o_orderdate"])
    )
    got = {
        r["o_orderkey"]
        for r in QUERIES["orders_skyline"](spark, SF_DIR).collect()
    }
    # brute-force frontier: an order survives iff no other order is
    # <= price (with key tiebreak making it strictly earlier in the
    # total order) AND >= date
    pts_sorted = sorted(pts, key=lambda t: (t[1], t[0]))
    best_date = None
    want = set()
    for k, p, d in pts_sorted:
        if best_date is None or d > best_date:
            want.add(k)
        best_date = d if best_date is None else max(best_date, d)
    assert got == want


def test_negative_sampling_tracks_distribution(spark):
    """1000 draws from unigram^0.75 must allocate counts roughly
    proportionally: the most-drawn token's share must exceed the
    uniform share and the draws must sum to <= 1000."""
    rows = QUERIES["text_negative_sampling"](spark, SF_DIR).collect()
    assert rows, "no draws returned"
    total_top = sum(r["n_drawn"] for r in rows)
    assert total_top <= 1000
    assert rows[0]["n_drawn"] >= rows[-1]["n_drawn"]


def test_ks_drift_bounded_and_complete(spark):
    rows = QUERIES["events_ks_drift"](spark, SF_DIR).collect()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    assert {r["event_type"] for r in rows} == set(ev["event_type"].unique())
    for r in rows:
        assert 0.0 <= r["ks_stat"] <= 1.0
        assert r["n0"] + r["n1"] == (ev["event_type"] == r["event_type"]).sum()


def test_littles_law_identity_holds(spark):
    """L = lambda * W by construction — the three reported numbers
    must satisfy the identity to rounding tolerance."""
    r = QUERIES["events_littles_law_audit"](spark, SF_DIR).collect()[0]
    lhs = r["l_avg_concurrent"]
    rhs = r["lambda_per_hour"] * r["w_hours"]
    assert abs(lhs - rhs) < 1e-3


def test_activity_bitmap_vs_python_masks(spark):
    """Masks recomputed in Python must give the same histogram."""
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    d0 = ev["ts"].dt.date.min()
    masks = {}
    for uid, grp in ev.groupby("user_id"):
        m = 0
        for d in grp["ts"].dt.date.unique():
            off = (d - d0).days
            if off < 63:
                m |= 1 << off
        masks[uid] = m
    import collections

    want = collections.Counter(bin(m).count("1") for m in masks.values())
    got = {
        r["n_active_days"]: r["n_users"]
        for r in QUERIES["events_activity_bitmap"](spark, SF_DIR).collect()
    }
    assert got == dict(want)
