"""Batch sessionization + PMI collocations (operators/sessions.py)."""

from __future__ import annotations

from datetime import datetime, timedelta

from dd_ops_ocr_spark.operators.sessions import collocations, sessionize

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_sessionize_gap_split(spark):
    rows = [
        (1, T0),
        (1, T0 + timedelta(minutes=10)),
        (1, T0 + timedelta(minutes=20)),          # session 0: 3 events
        (1, T0 + timedelta(minutes=55)),          # 35-min gap -> session 1
        (1, T0 + timedelta(minutes=60)),
        (2, T0),                                  # other user isolated
    ]
    out = {
        (r["user_id"], r["session_idx"]): r
        for r in sessionize(_events(spark, rows), gap_minutes=30).collect()
    }
    assert out[(1, 0)]["n_events"] == 3
    assert out[(1, 0)]["duration_sec"] == 20 * 60
    assert out[(1, 1)]["n_events"] == 2
    assert out[(1, 1)]["duration_sec"] == 5 * 60
    assert out[(2, 0)]["n_events"] == 1 and out[(2, 0)]["duration_sec"] == 0
    assert len(out) == 3


def test_sessionize_gap_boundary_exact(spark):
    # gap strictly-greater: an EXACTLY 30-min gap stays one session,
    # 30 min + 1 microsecond splits
    rows = [
        (1, T0),
        (1, T0 + timedelta(minutes=30)),
        (2, T0),
        (2, T0 + timedelta(minutes=30, microseconds=1)),
    ]
    out = sessionize(_events(spark, rows), gap_minutes=30).collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r)
    assert len(per_user[1]) == 1 and per_user[1][0]["n_events"] == 2
    assert len(per_user[2]) == 2


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_collocations_planted_mwe_ranks_first(spark):
    # "san francisco" always adjacent; filler words independent
    base = "alpha beta gamma delta"
    rows = [(i, base + " san francisco " + base) for i in range(6)]
    out = collocations(_docs(spark, rows), top_k=3, min_count=3).collect()
    assert (out[0]["w1"], out[0]["w2"]) == ("san", "francisco")
    assert out[0]["rank"] == 1 and out[0]["pmi_bits"] > 0


def test_collocations_independent_pair_nonpositive(spark):
    # "x y" and "y x" equally often -> P(xy) ~ P(x)P(y): pmi_bits <= 1
    rows = [(i, "x y " * 10 + "y x " * 10) for i in range(3)]
    out = {
        (r["w1"], r["w2"]): r["pmi_bits"]
        for r in collocations(_docs(spark, rows), top_k=10, min_count=3).collect()
    }
    assert out[("x", "y")] <= 1 and out[("y", "x")] <= 1


def test_collocations_min_count_filter(spark):
    rows = [(1, "rare pair common common common common common common")]
    out = collocations(_docs(spark, rows), top_k=10, min_count=5).collect()
    assert all((r["w1"], r["w2"]) != ("rare", "pair") for r in out)


# ----------------------------------------------------- rolling window

def _evrows4(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


def test_rolling_window_boundary_inclusive(spark):
    """RANGE frames are inclusive at both bounds: an event EXACTLY 24h
    earlier is in the frame; one microsecond past it is not."""
    from dd_ops_ocr_spark.operators.sessions import rolling_window

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, 7, t0, 1.00),
        (2, 7, t0 + timedelta(hours=24), 2.00),                    # sees e1
        (3, 7, t0 + timedelta(hours=24, microseconds=1), 4.00),    # not e1
    ]
    got = {r.event_id: r for r in rolling_window(_evrows4(spark, rows)).collect()}
    assert (got[1].n_trailing, got[1].v_cents_trailing) == (1, 100)
    assert (got[2].n_trailing, got[2].v_cents_trailing) == (2, 300)
    assert (got[3].n_trailing, got[3].v_cents_trailing) == (2, 600)


def test_rolling_window_equal_ts_peers_see_each_other(spark):
    """Peers of the current row are IN the frame (SQL standard) — no
    tie-order hazard."""
    from dd_ops_ocr_spark.operators.sessions import rolling_window

    t0 = datetime(2024, 1, 1)
    rows = [(1, 3, t0, 1.00), (2, 3, t0, 2.00)]
    got = {r.event_id: r for r in rolling_window(_evrows4(spark, rows)).collect()}
    assert got[1].n_trailing == 2 and got[2].n_trailing == 2
    assert got[1].v_cents_trailing == got[2].v_cents_trailing == 300


def test_rolling_window_user_isolation(spark):
    from dd_ops_ocr_spark.operators.sessions import rolling_window

    t0 = datetime(2024, 1, 1)
    rows = [(1, 1, t0, 1.00), (2, 2, t0, 5.00)]
    got = {r.event_id: r for r in rolling_window(_evrows4(spark, rows)).collect()}
    assert got[1].n_trailing == 1 and got[1].v_cents_trailing == 100
    assert got[2].n_trailing == 1 and got[2].v_cents_trailing == 500


# ------------------------------------------------------------- funnel

def _fev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def test_funnel_stage_semantics(spark):
    """Order matters, strict timestamps, greedy matching, and users
    with no funnel events land in stage 0."""
    from dd_ops_ocr_spark.operators.sessions import funnel_stages

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # u1: full ordered funnel -> 3
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        # u2: purchase BEFORE the view/click -> stops at 2
        (2, t(1), "purchase"), (2, t(2), "view"), (2, t(3), "click"),
        # u3: click at the SAME timestamp as view -> strict order
        # fails, stage 1
        (3, t(1), "view"), (3, t(1), "click"),
        # u4: greedy walk survives interleaved noise -> 3
        (4, t(1), "view"), (4, t(2), "click"), (4, t(3), "view"),
        (4, t(4), "purchase"),
        # u5: only non-funnel events -> 0
        (5, t(1), "error"), (5, t(2), "signup"),
    ]
    got = {r.stage: r.n_users for r in funnel_stages(_fev(spark, rows)).collect()}
    assert got == {3: 2, 2: 1, 1: 1, 0: 1}


# ---------------------------------------------------------- retention

def test_retention_cohort_semantics(spark):
    """Cohort anchors at the FIRST signup; pre-signup activity never
    counts; one count per (user, week) however many events; users
    without a signup are absent."""
    from dd_ops_ocr_spark.operators.sessions import retention_cohorts

    d = lambda day, h=0: datetime(2024, 1, 1 + day, h)
    rows = [
        # u1 signs up day 0, active day 1 (same week) and day 8 (wk+1,
        # twice — must count once)
        (1, d(0), "signup"), (1, d(1), "view"),
        (1, d(8), "view"), (1, d(8, 5), "click"),
        # u2: activity BEFORE signup (day 0) must not count; signup
        # day 7 -> cohort week differs from u1's
        (2, d(0), "view"), (2, d(7), "signup"), (2, d(9), "view"),
        # u3: no signup -> absent entirely
        (3, d(0), "view"),
    ]
    got = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in retention_cohorts(_fev(spark, rows)).collect()
    }
    w1 = (1704067200 * 1_000_000) // (7 * 86_400 * 1_000_000)  # 2024-01-01
    w2 = ((1704067200 + 7 * 86400) * 1_000_000) // (7 * 86_400 * 1_000_000)
    assert got == {(w1, 0): 1, (w1, w2 - w1): 1, (w2, 0): 1}


def test_conversion_latency_hand_case(spark):
    """Latency = greedy completing purchase minus FIRST view; the
    later duplicate view must not move the anchor."""
    from dd_ops_ocr_spark.operators.sessions import conversion_latency

    t = lambda s: datetime(2024, 1, 1) + timedelta(seconds=s)
    rows = [
        (1, t(10), "view"), (1, t(20), "view"),
        (1, t(30), "click"), (1, t(40), "purchase"),   # 30 s
        (2, t(0), "view"), (2, t(5), "click"), (2, t(95), "purchase"),  # 95 s
        (3, t(0), "view"), (3, t(1), "click"),          # not converted
    ]
    r = conversion_latency(_fev(spark, rows)).collect()[0]
    assert r.n_converted == 2
    assert r.p50_us == (30_000_000 + 95_000_000) / 2
    # rank 0.95*(n-1) = 0.95 -> 30e6 + 0.95*(95e6-30e6)
    assert abs(r.p95_us - (30_000_000 + 0.95 * 65_000_000)) < 1e-6


def test_attribution_first_last_semantics(spark):
    """First credits the earliest prior touch, last the latest; a
    conversion with no prior touch lands in '(none)'; touches AFTER
    the conversion never count; equal-timestamp ties break by
    event_id."""
    from dd_ops_ocr_spark.operators.sessions import attribution

    rows = [
        # user 1: view -> click -> purchase  (first=view, last=click)
        (1, 1, "2024-01-01 10:00:00", "view"),
        (2, 1, "2024-01-01 10:05:00", "click"),
        (3, 1, "2024-01-01 10:10:00", "purchase"),
        # user 2: purchase with no prior touch, then a view (ignored)
        (4, 2, "2024-01-01 09:00:00", "purchase"),
        (5, 2, "2024-01-01 11:00:00", "view"),
        # user 3: tie at the same ts — event_id order decides
        (6, 3, "2024-01-01 08:00:00", "signup"),
        (7, 3, "2024-01-01 08:00:00", "click"),
        (8, 3, "2024-01-01 08:30:00", "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    )
    got = {(r.model, r.channel): r.n_conv for r in attribution(df).collect()}
    assert got == {
        ("first", "view"): 1, ("last", "click"): 2,
        ("first", "(none)"): 1, ("last", "(none)"): 1,
        ("first", "signup"): 1,
    }
