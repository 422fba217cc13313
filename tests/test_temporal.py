"""Hand-computed ledgers for the temporal-alignment operators
(operators/temporal.py): as-of join, ordered funnel, cohort
retention."""
from datetime import datetime

import pytest  # noqa: F401

from pyspark.sql import functions as F

from jsonschema_spark.operators.temporal import (
    asof_join,
    cohort_retention,
    funnel,
)


def _ts(s):
    return datetime.fromisoformat(s)


def _asof_fixtures(spark):
    right = spark.createDataFrame(
        [("a", _ts("2024-01-01 10:00:00"), 1),
         ("a", _ts("2024-01-01 10:00:05"), 2),
         ("b", _ts("2024-01-01 10:00:03"), 7),
         ("b", None, 9)],  # NULL right ts never matches
        "k string, rts timestamp, val long")
    left = spark.createDataFrame(
        [("a", _ts("2024-01-01 09:59:59"), "p"),
         ("a", _ts("2024-01-01 10:00:00"), "q"),   # equality matches
         ("a", _ts("2024-01-01 10:00:04"), "r"),
         ("a", _ts("2024-01-01 10:00:07"), "s"),
         ("b", _ts("2024-01-01 10:00:10"), "t"),
         ("b", None, "u"),                          # NULL left ts
         ("c", _ts("2024-01-01 10:00:00"), "v")],   # key absent
        "k string, lts timestamp, x string")
    return left, right


def test_asof_join_backward_hand_computed(spark):
    left, right = _asof_fixtures(spark)
    out = asof_join(left, right, "k", "lts", "rts", ["val"])
    rows = {r["x"]: r for r in out.collect()}
    assert len(rows) == 7  # left-join shape: every left row kept
    assert rows["p"]["val"] is None and rows["p"]["asof_ts"] is None
    assert rows["p"]["asof_gap_us"] is None
    assert (rows["q"]["val"], rows["q"]["asof_gap_us"]) == (1, 0)
    assert (rows["r"]["val"], rows["r"]["asof_gap_us"]) == (1, 4_000_000)
    assert (rows["s"]["val"], rows["s"]["asof_gap_us"]) == (2, 2_000_000)
    assert (rows["t"]["val"], rows["t"]["asof_gap_us"]) == (7, 7_000_000)
    assert rows["t"]["asof_ts"] == _ts("2024-01-01 10:00:03")
    assert rows["u"]["val"] is None
    assert rows["v"]["val"] is None


def test_asof_join_tolerance_and_forward(spark):
    left, right = _asof_fixtures(spark)
    out = asof_join(left, right, "k", "lts", "rts", ["val"],
                    tolerance_s=3)
    rows = {r["x"]: r for r in out.collect()}
    assert len(rows) == 7
    # gap 4s exceeds the 3s tolerance: match nulled, row kept
    assert rows["r"]["val"] is None and rows["r"]["asof_ts"] is None
    assert (rows["s"]["val"], rows["s"]["asof_gap_us"]) == (2, 2_000_000)
    assert rows["t"]["val"] is None  # 7s gap

    fwd = asof_join(left, right, "k", "lts", "rts", ["val"],
                    direction="forward")
    rows = {r["x"]: r for r in fwd.collect()}
    assert (rows["p"]["val"], rows["p"]["asof_gap_us"]) == (1, 1_000_000)
    assert (rows["q"]["val"], rows["q"]["asof_gap_us"]) == (1, 0)
    assert (rows["r"]["val"], rows["r"]["asof_gap_us"]) == (2, 1_000_000)
    assert rows["s"]["val"] is None  # nothing after 10:00:07
    assert rows["t"]["val"] is None
    assert rows["u"]["val"] is None


def test_asof_join_partition_invariant(spark):
    left, right = _asof_fixtures(spark)
    a = sorted(map(repr,
                   asof_join(left, right, "k", "lts", "rts",
                             ["val"]).collect()))
    b = sorted(map(repr,
                   asof_join(left.repartition(7), right.repartition(5),
                             "k", "lts", "rts", ["val"]).collect()))
    assert a == b


def test_asof_join_null_value_from_matched_row(spark):
    # ADVICE r4 repro: the matched (latest) right row carries a NULL
    # value column — it must stay NULL, not backfill from an older row,
    # and ALL value columns must come from that single matched row.
    right = spark.createDataFrame(
        [("a", _ts("2024-01-01 10:00:00"), 1, "old"),
         ("a", _ts("2024-01-01 10:00:05"), None, "new")],
        "k string, rts timestamp, val long, tag string")
    left = spark.createDataFrame(
        [("a", _ts("2024-01-01 10:00:06"), "L")],
        "k string, lts timestamp, x string")
    row = asof_join(left, right, "k", "lts", "rts",
                    ["val", "tag"]).collect()[0]
    assert row["asof_ts"] == _ts("2024-01-01 10:00:05")
    assert row["val"] is None          # NOT backfilled to 1
    assert row["tag"] == "new"         # same row as the NULL val


def test_asof_join_tied_right_rows_deterministic(spark):
    # Right rows sharing (key, ts): the greatest value_cols struct wins,
    # regardless of input partitioning (docstring contract).
    right = spark.createDataFrame(
        [("a", _ts("2024-01-01 10:00:00"), 3, "x"),
         ("a", _ts("2024-01-01 10:00:00"), 9, "y"),
         ("a", _ts("2024-01-01 10:00:00"), 5, "z")],
        "k string, rts timestamp, val long, tag string")
    left = spark.createDataFrame(
        [("a", _ts("2024-01-01 10:00:01"), "L")],
        "k string, lts timestamp, x string")
    for r in (right, right.repartition(5), right.coalesce(1)):
        row = asof_join(left, r, "k", "lts", "rts",
                        ["val", "tag"]).collect()[0]
        assert (row["val"], row["tag"]) == (9, "y")


def test_funnel_hand_computed(spark):
    rows = []
    seqs = {
        "u1": [("A", 1), ("B", 2), ("C", 3)],      # full path -> 3
        "u2": [("B", 1), ("A", 2), ("C", 3)],      # B precedes A -> 1
        "u3": [("A", 1), ("B", 1), ("C", 2)],      # tie never advances -> 1
        "u4": [("A", 5)],                          # -> 1
        "u5": [("B", 1), ("C", 2)],                # never starts -> 0
        "u6": [("A", 1), ("A", 2), ("B", 3)],      # -> 2
    }
    for u, evs in seqs.items():
        for t, sec in evs:
            rows.append((u, _ts(f"2024-01-01 10:00:{sec:02d}"), t))
    df = spark.createDataFrame(rows, "u string, ts timestamp, t string")
    out = {r["step"]: r for r in
           funnel(df, "u", "ts", "t", ["A", "B", "C"]).collect()}
    assert [out[i]["step_type"] for i in (1, 2, 3)] == ["A", "B", "C"]
    assert (out[1]["n_users"], out[2]["n_users"], out[3]["n_users"]) \
        == (5, 2, 1)
    assert out[1]["conversion_ppm"] == 1_000_000
    assert out[2]["conversion_ppm"] == 400_000
    assert out[3]["conversion_ppm"] == 200_000
    # repeated step types: the cursor needs a strictly LATER same-type
    # event
    rep = {r["step"]: r["n_users"] for r in
           funnel(df, "u", "ts", "t", ["A", "A"]).collect()}
    # u6 has A@1 < A@2 -> 2; u1/u3/u4 one A -> 1; u2 one A -> 1
    assert rep == {1: 5, 2: 1}
    # empty first step: counts 0, ppm NULL
    z = funnel(df.where(F.col("t") == "C"), "u", "ts", "t",
               ["A", "B"]).collect()
    assert all(r["n_users"] == 0 and r["conversion_ppm"] is None
               for r in z)


def test_funnel_partition_invariant(spark):
    df = spark.range(3000).select(
        (F.col("id") % 97).alias("u"),
        F.timestamp_seconds(1_700_000_000
                            + (F.col("id") * 7919) % 100_000).alias("ts"),
        F.element_at(
            F.array(F.lit("A"), F.lit("B"), F.lit("C"), F.lit("D")),
            ((F.col("id") * 31) % 4 + 1).cast("int")).alias("t"),
    )
    steps = ["A", "B", "C"]
    a = sorted(map(tuple, funnel(df, "u", "ts", "t", steps).collect()))
    b = sorted(map(tuple, funnel(df.repartition(13), "u", "ts", "t",
                                 steps).collect()))
    assert a == b


def test_cohort_retention_hand_computed(spark):
    # 2024-01-01 is a Monday: week cohorts align to it
    rows = [
        ("u1", "2024-01-01 08:00:00"), ("u1", "2024-01-03 09:00:00"),
        ("u1", "2024-01-09 10:00:00"), ("u1", "2024-01-16 11:00:00"),
        ("u2", "2024-01-02 08:00:00"), ("u2", "2024-01-10 09:00:00"),
        ("u3", "2024-01-09 08:00:00"), ("u3", "2024-01-25 09:00:00"),
    ]
    df = spark.createDataFrame(
        [(u, _ts(s)) for u, s in rows], "u string, ts timestamp")
    out = {(r["cohort"], r["offset"]): r for r in
           cohort_retention(df, "u", "ts").collect()}
    assert set(out) == {("2024-01-01", 0), ("2024-01-01", 1),
                        ("2024-01-01", 2), ("2024-01-08", 0),
                        ("2024-01-08", 2)}
    r0 = out[("2024-01-01", 0)]
    assert (r0["n_users"], r0["cohort_users"],
            r0["retention_ppm"]) == (2, 2, 1_000_000)
    assert out[("2024-01-01", 1)]["n_users"] == 2
    assert out[("2024-01-01", 2)]["n_users"] == 1
    assert out[("2024-01-01", 2)]["retention_ppm"] == 500_000
    assert out[("2024-01-08", 2)]["retention_ppm"] == 1_000_000
    # monthly offsets use exact calendar month arithmetic
    m = {(r["cohort"], r["offset"]): r["n_users"] for r in
         cohort_retention(df, "u", "ts", period="month").collect()}
    assert m == {("2024-01-01", 0): 3}


def test_markov_transitions_hand_computed(spark):
    rows = [
        ("u1", "2024-01-01 10:00:01", 1, "A"),
        ("u1", "2024-01-01 10:00:02", 2, "B"),
        ("u1", "2024-01-01 10:00:03", 3, "A"),
        ("u2", "2024-01-01 10:00:01", 4, "B"),
        ("u2", "2024-01-01 10:00:02", 5, "B"),
        ("u3", "2024-01-01 10:00:01", 6, "A"),   # lone event: no pair
        (None, "2024-01-01 10:00:01", 7, "A"),   # dropped
        ("u2", "2024-01-01 10:00:03", 8, None),  # dropped, no break
    ]
    from jsonschema_spark.operators.temporal import markov_transitions
    df = spark.createDataFrame(
        [(u, _ts(s), i, t) for u, s, i, t in rows],
        "u string, ts timestamp, eid long, t string")
    out = {(r["src"], r["dst"]): r for r in
           markov_transitions(df, "u", "ts", "t", id_col="eid")
           .collect()}
    assert set(out) == {("A", "B"), ("B", "A"), ("B", "B")}
    assert out[("A", "B")]["n_pairs"] == 1
    assert out[("A", "B")]["row_ppm"] == 1_000_000
    assert out[("B", "A")]["row_ppm"] == 500_000
    assert out[("B", "B")]["row_ppm"] == 500_000
    # exact-ts tie broken by id_col: B(eid 10) before A(eid 11)
    tie = spark.createDataFrame(
        [("u", _ts("2024-01-01 10:00:01"), 9, "C"),
         ("u", _ts("2024-01-01 10:00:02"), 10, "B"),
         ("u", _ts("2024-01-01 10:00:02"), 11, "A")],
        "u string, ts timestamp, eid long, t string")
    got = {(r["src"], r["dst"]) for r in
           markov_transitions(tie, "u", "ts", "t", id_col="eid")
           .collect()}
    assert got == {("C", "B"), ("B", "A")}


def test_interarrival_stats_hand_computed(spark):
    from jsonschema_spark.operators.temporal import interarrival_stats
    rows = [("u1", "2024-01-01 10:00:00"), ("u1", "2024-01-01 10:00:01"),
            ("u1", "2024-01-01 10:00:03"), ("u2", "2024-01-01 10:00:10"),
            ("u2", "2024-01-01 10:00:20"), (None, "2024-01-01 10:00:30"),
            ("u3", "2024-01-01 11:00:00")]  # lone event: no gap
    df = spark.createDataFrame([(u, _ts(s)) for u, s in rows],
                               "u string, ts timestamp")
    r = interarrival_stats(df, "u", "ts").collect()[0]
    # gaps: 1s, 2s (u1), 10s (u2)
    assert r["n_gaps"] == 3
    assert r["mean_us"] == 13_000_000 // 3
    assert (r["min_us"], r["max_us"]) == (1_000_000, 10_000_000)
    assert r["p50_us"] == 2_000_000
    # p90: idx 0.9*(3-1)=1.8 -> 2e6 + 0.8*(1e7-2e6)
    assert r["p90_us"] == 8_400_000


def test_funnel_durations_hand_computed(spark):
    from jsonschema_spark.operators.temporal import funnel_durations
    rows = []
    seqs = {
        "u1": [("A", 1), ("B", 2), ("C", 3)],
        "u2": [("B", 1), ("A", 2), ("C", 3)],
        "u3": [("A", 1), ("B", 1), ("C", 2)],
        "u4": [("A", 5)],
        "u5": [("B", 1), ("C", 2)],
        "u6": [("A", 1), ("A", 2), ("B", 3)],
    }
    for u, evs in seqs.items():
        for t, sec in evs:
            rows.append((u, _ts(f"2024-01-01 10:00:{sec:02d}"), t))
    df = spark.createDataFrame(rows, "u string, ts timestamp, t string")
    out = {r["step"]: r for r in funnel_durations(
        df, "u", "ts", "t", ["A", "B", "C"]).collect()}
    # same reach counts as funnel()
    assert [out[i]["n_users"] for i in (1, 2, 3)] == [5, 2, 1]
    assert out[1]["mean_us_from_first"] == 0
    # u1: B at +1s; u6: B at +2s -> mean 1.5s
    assert out[2]["mean_us_from_first"] == 1_500_000
    assert out[3]["mean_us_from_first"] == 2_000_000
    # nobody reaches: NULL mean
    z = {r["step"]: r for r in funnel_durations(
        df, "u", "ts", "t", ["C", "A"]).collect()}
    assert z[2]["n_users"] == 0
    assert z[2]["mean_us_from_first"] is None


def test_session_rules_hand_computed(spark):
    from jsonschema_spark.operators.temporal import session_rules
    rows = [
        ("u1", "2024-01-01 10:00:00", "A"),
        ("u1", "2024-01-01 10:10:00", "B"),
        ("u1", "2024-01-01 10:20:00", "A"),   # same session, dup type
        ("u1", "2024-01-01 12:00:00", "A"),   # new session {A}
        ("u2", "2024-01-01 10:00:00", "B"),
        ("u2", "2024-01-01 10:05:00", "C"),
    ]
    df = spark.createDataFrame([(u, _ts(s), t) for u, s, t in rows],
                               "u string, ts timestamp, t string")
    out = {(r["src"], r["dst"]): r for r in session_rules(
        df, "u", "ts", "t", gap="30 minutes", min_support=1).collect()}
    # baskets: {A,B}, {A}, {B,C} -> n_sessions 3; A:2 B:2 C:1
    assert set(out) == {("A", "B"), ("B", "A"), ("B", "C"), ("C", "B")}
    ab = out[("A", "B")]
    assert (ab["n_both"], ab["n_src"], ab["n_dst"]) == (1, 2, 2)
    assert ab["support_ppm"] == 333_333
    assert ab["confidence_ppm"] == 500_000
    assert ab["lift_ppm"] == 750_000
    assert out[("C", "B")]["confidence_ppm"] == 1_000_000
    assert out[("B", "C")]["lift_ppm"] == 1_500_000
    # min_support prunes before any join
    assert session_rules(df, "u", "ts", "t", gap="30 minutes",
                         min_support=2).count() == 0


def test_top_k_per_group_hand_computed(spark):
    from jsonschema_spark.operators.stats import top_k_per_group
    df = spark.createDataFrame(
        [("a", 5, 1), ("a", 3, 2), ("a", 1, 3), ("a", 3, 4),
         ("b", 7, 5)],
        "g string, v long, id long")
    out = top_k_per_group(df, ["g"],
                          [F.col("v").desc(), F.col("id")], 2)
    got = sorted((r["g"], r["rnk"], r["v"], r["id"])
                 for r in out.collect())
    # tie at v=3 broken by id: (3,2) ranks 2, (3,4) cut
    assert got == [("a", 1, 5, 1), ("a", 2, 3, 2), ("b", 1, 7, 5)]


def test_funnel_strategies_equal(spark):
    """The k-pass min-after-previous strategy is row-identical to the
    fold — on the hand ledger AND on a generated stream (the in-repo
    greedy==iterative proof, independent of the oracle)."""
    from jsonschema_spark.operators.temporal import funnel
    df = spark.range(5000).select(
        (F.col("id") % 83).alias("u"),
        F.timestamp_seconds(1_700_000_000
                            + (F.col("id") * 6007) % 90_000).alias("ts"),
        F.element_at(
            F.array(F.lit("A"), F.lit("B"), F.lit("C"), F.lit("D")),
            ((F.col("id") * 13) % 4 + 1).cast("int")).alias("t"),
    )
    steps = ["A", "B", "C"]
    a = sorted(map(tuple,
                   funnel(df, "u", "ts", "t", steps).collect()))
    b = sorted(map(tuple,
                   funnel(df, "u", "ts", "t", steps,
                          strategy="passes").collect()))
    assert a == b
    # empty-first-step corner matches too (counts 0, NULL ppm)
    za = funnel(df.where(F.col("t") != "A"), "u", "ts", "t",
                steps).collect()
    zb = funnel(df.where(F.col("t") != "A"), "u", "ts", "t",
                steps, strategy="passes").collect()
    assert sorted(map(tuple, za)) == sorted(map(tuple, zb))


def test_funnel_hot_user_cap(spark):
    """VERDICT r4 directive 2: the max_events_per_user guard.

    (a) planted bot — ONE user with 10⁶ step-type events completes
        under a small cap (the collect_list array is cap-bounded, not
        event-bounded) and still full-converts: its earliest events
        already contain A<B<C;
    (b) truncation semantics — a user whose completing event lies
        BEYOND the cap under-reports exactly as documented;
    (c) default cap is behavior-preserving at human scales and both
        strategies stay row-identical under a cap.
    """
    from jsonschema_spark.operators.temporal import (
        funnel, funnel_durations)

    steps = ["A", "B", "C"]
    # bot: 10^6 events cycling A,B,C every second; 5 humans with A<B<C
    bot = spark.range(1_000_000).select(
        F.lit("bot").alias("u"),
        F.timestamp_seconds(1_700_000_000 + F.col("id")).alias("ts"),
        F.element_at(
            F.array(F.lit("A"), F.lit("B"), F.lit("C")),
            (F.col("id") % 3 + 1).cast("int")).alias("t"))
    hum = spark.range(5).select(
        F.concat(F.lit("h"), F.col("id")).alias("u"),
        F.timestamp_seconds(1_700_000_000 + F.col("id")).alias("ts"),
        F.lit("A").alias("t"))
    hum = hum.unionByName(
        hum.select("u", (F.col("ts") + F.expr("INTERVAL 10 SECONDS")
                         ).alias("ts"), F.lit("B").alias("t"))
    ).unionByName(
        hum.select("u", (F.col("ts") + F.expr("INTERVAL 20 SECONDS")
                         ).alias("ts"), F.lit("C").alias("t")))
    ev = bot.unionByName(hum)
    got = {r["step"]: r["n_users"] for r in
           funnel(ev, "u", "ts", "t", steps,
                  max_events_per_user=1000).collect()}
    assert got == {1: 6, 2: 6, 3: 6}  # bot + 5 humans all convert
    d = {r["step"]: r["n_users"] for r in
         funnel_durations(ev, "u", "ts", "t", steps,
                          max_events_per_user=1000).collect()}
    assert d == {1: 6, 2: 6, 3: 6}

    # (b) user whose C arrives only at event #4: cap=3 truncates it
    late = spark.createDataFrame(
        [("x", _ts("2024-01-01 10:00:00"), "A"),
         ("x", _ts("2024-01-01 10:00:01"), "B"),
         ("x", _ts("2024-01-01 10:00:02"), "B"),
         ("x", _ts("2024-01-01 10:00:03"), "C")],
        "u string, ts timestamp, t string")
    capped = {r["step"]: r["n_users"] for r in
              funnel(late, "u", "ts", "t", steps,
                     max_events_per_user=3).collect()}
    assert capped == {1: 1, 2: 1, 3: 0}
    full = {r["step"]: r["n_users"] for r in
            funnel(late, "u", "ts", "t", steps).collect()}
    assert full == {1: 1, 2: 1, 3: 1}  # default cap >> 4 events

    # (c) both strategies identical under the same cap
    a = sorted(map(tuple, funnel(ev, "u", "ts", "t", steps,
                                 max_events_per_user=1000).collect()))
    b = sorted(map(tuple, funnel(ev, "u", "ts", "t", steps,
                                 strategy="passes",
                                 max_events_per_user=1000).collect()))
    assert a == b
