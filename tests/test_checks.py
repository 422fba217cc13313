"""Hand-computed ledgers for the table-level check operators
(operators/checks.py): Deequ-style check_suite, functional-dependency
violations, cross-table aggregate reconciliation."""
import math

import pytest  # noqa: F401

from pyspark.sql import functions as F

from jsonschema_spark.operators.checks import (
    OPEN_BOUND,
    check_suite,
    fd_violations,
    reconcile_sum,
)


def test_check_suite_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 10.5, None),
            (2, "a", None, None),
            (3, None, -2.25, None),
            (4, "b", 3.0, None),
            (4, "c", 3.0, None),
        ],
        "id long, v string, x double, z double",
    )
    out = check_suite(df, [
        {"name": "size_ok", "check": "size_min", "min": 5},
        {"name": "size_bad", "check": "size_min", "min": 6},
        {"name": "v_complete", "check": "completeness", "col": "v",
         "min_ppm": 800_000},
        {"name": "id_pk", "check": "distinctness", "col": "id",
         "min_ppm": 1_000_000},
        {"name": "x_min", "check": "min_ge", "col": "x",
         "scale": 100, "ge": 0},
        {"name": "x_max", "check": "max_le", "col": "x", "le": 10},
        {"name": "x_mean", "check": "mean_scaled_between", "col": "x",
         "scale": 100, "lo": 356, "hi": 356},
        {"name": "v_format", "check": "match_ppm", "col": "v",
         "pattern": "^[ab]$", "min_ppm": 700_000},
        {"name": "v_domain", "check": "contained_ppm", "col": "v",
         "allowed": ["a", "b"], "min_ppm": 800_000},
        {"name": "z_min", "check": "min_ge", "col": "z", "ge": 0},
    ])
    rows = {r["check_name"]: r for r in out.collect()}
    assert len(rows) == 10
    assert (rows["size_ok"]["metric"], rows["size_ok"]["status"]) \
        == (5, "pass")
    assert rows["size_ok"]["hi"] == OPEN_BOUND
    assert rows["size_bad"]["status"] == "fail"
    # 4 non-null of 5 rows
    assert (rows["v_complete"]["metric"],
            rows["v_complete"]["status"]) == (800_000, "pass")
    # distinct non-null ids {1,2,3,4} of 5 rows
    assert (rows["id_pk"]["metric"], rows["id_pk"]["status"]) \
        == (800_000, "fail")
    # floor(-2.25*100) = -225
    assert (rows["x_min"]["metric"], rows["x_min"]["status"]) \
        == (-225, "fail")
    # floor at scale 1: max(10, -3, 3, 3) = 10 <= 10
    assert (rows["x_max"]["metric"], rows["x_max"]["status"]) \
        == (10, "pass")
    # floor((1050 - 225 + 300 + 300) / 4) = floor(356.25)
    assert (rows["x_mean"]["metric"], rows["x_mean"]["status"]) \
        == (356, "pass")
    # a, a, b match of 4 non-null
    assert (rows["v_format"]["metric"], rows["v_format"]["status"]) \
        == (750_000, "pass")
    assert (rows["v_domain"]["metric"], rows["v_domain"]["status"]) \
        == (750_000, "fail")
    # all-NULL column: NULL metric fails, never passes
    assert rows["z_min"]["metric"] is None
    assert rows["z_min"]["status"] == "fail"


def test_check_suite_partition_invariant(spark):
    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 7).cast("string").alias("v"),
        (F.col("id") % 13).cast("double").alias("x"),
    )
    checks = [
        {"name": "n", "check": "size_min", "min": 1},
        {"name": "d", "check": "distinctness", "col": "v",
         "min_ppm": 1},
        {"name": "m", "check": "mean_scaled_between", "col": "x",
         "scale": 1000, "lo": 0, "hi": 10**9},
    ]
    a = sorted(map(tuple, check_suite(df, checks).collect()))
    b = sorted(map(tuple,
                   check_suite(df.repartition(17), checks).collect()))
    assert a == b


def test_fd_violations_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (1, "y"), (2, "x"),
         (3, None), (3, "z"), (4, None)],
        "k long, r string",
    )
    got = {r["k"]: r for r in
           fd_violations(df, ["k"], "r").collect()}
    assert set(got) == {1, 3}  # 2 and 4 are single-valued
    assert (got[1]["n_rows"], got[1]["n_distinct_rhs"],
            got[1]["rhs_min"], got[1]["rhs_max"]) == (3, 2, "x", "y")
    # NULL rhs counts as a distinct determination; min/max skip it
    assert (got[3]["n_rows"], got[3]["n_distinct_rhs"],
            got[3]["rhs_min"], got[3]["rhs_max"]) == (2, 2, "z", "z")


def test_reconcile_sum_hand_computed(spark):
    parent = spark.createDataFrame(
        [(1, 10.00), (2, 5.50), (3, 7.00)],
        "k long, total double")
    child = spark.createDataFrame(
        [(1, 4.0), (1, 6.0), (2, 5.49)], "k long, amt double")
    out = {r["k"]: r for r in reconcile_sum(
        parent, "k", "total", child, "k", F.col("amt")).collect()}
    assert (out[1]["parts_units"], out[1]["n_parts"],
            out[1]["diff_units"], out[1]["status"]) == (1000, 2, 0, "ok")
    # IEEE-exact expectation, same double ops as both engines
    exp2 = math.floor(5.49 * 100.0)
    stated2 = math.floor(5.50 * 100.0)
    assert out[2]["parts_units"] == exp2
    assert out[2]["diff_units"] == exp2 - stated2
    assert out[2]["status"] == ("ok" if exp2 == stated2 else "mismatch")
    assert (out[3]["parts_units"], out[3]["n_parts"],
            out[3]["diff_units"], out[3]["status"]) \
        == (0, 0, -700, "no_parts")

    # tolerance turns the off-by-rounding row into a pass
    tol = {r["k"]: r["status"] for r in reconcile_sum(
        parent, "k", "total", child, "k", F.col("amt"),
        tol_units=1).collect()}
    assert tol[2] == "ok" and tol[3] == "no_parts"


def test_table_fingerprint_properties(spark):
    from jsonschema_spark.operators.checks import table_fingerprint

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, "b")],
        "id long, v string")
    fp = sorted(map(tuple,
                    table_fingerprint(df, ["id", "v"]).collect()))
    # multiset-equal tables fingerprint identically under any order
    # and partitioning
    fp2 = sorted(map(tuple, table_fingerprint(
        df.orderBy(F.desc("id")).repartition(7),
        ["id", "v"]).collect()))
    assert fp == fp2
    assert sum(r[1] for r in fp) == 4
    # a single changed value changes the fingerprint
    df3 = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, "c")],
        "id long, v string")
    assert fp != sorted(map(tuple,
                            table_fingerprint(df3, ["id", "v"])
                            .collect()))
    # NULL and empty string are distinct renderings
    dn = spark.createDataFrame([(2, "")], "id long, v string")
    d0 = spark.createDataFrame([(2, None)], "id long, v string")
    assert table_fingerprint(dn, ["id", "v"]).collect() \
        != table_fingerprint(d0, ["id", "v"]).collect()


def test_partition_anomaly_hand_computed(spark):
    from jsonschema_spark.operators.checks import partition_anomaly

    # buckets: a=10 rows, b=10, c=11, d=4 (low), e=30 (high)
    rows = ([("a",)] * 10 + [("b",)] * 10 + [("c",)] * 11
            + [("d",)] * 4 + [("e",)] * 30)
    df = spark.createDataFrame(rows, "b string")
    got = {r["bucket"]: r for r in partition_anomaly(
        df, F.col("b"), lo_ppm=500_000, hi_ppm=2_000_000).collect()}
    # sorted counts [4,10,10,11,30] -> lower median = 10
    assert got["a"]["median_rows"] == 10
    assert (got["d"]["ratio_ppm"], got["d"]["status"]) \
        == (400_000, "low")
    assert (got["e"]["ratio_ppm"], got["e"]["status"]) \
        == (3_000_000, "high")
    assert all(got[k]["status"] == "ok" for k in ("a", "b", "c"))
    assert got["c"]["ratio_ppm"] == 1_100_000


def test_blocklist_route_hand_computed(spark):
    from jsonschema_spark.operators.curate import blocklist_route

    df = spark.createDataFrame(
        [
            (1, "https://ads.spam-hub.net/x", "a clean page"),
            (2, "https://ok.example.org/y", "win the casino lottery"),
            (3, "https://ok.example.org/z", "CASINO nights"),
            (4, "https://ok.example.org/w", "a casinogram page"),
            (5, "https://ok.example.org/v", None),
        ],
        "doc_id long, url string, text string",
    )
    out = {r["doc_id"]: r for r in blocklist_route(
        df, "url", "text", ["spam-hub.net"],
        ["casino", "lottery"], max_hits=2).collect()}
    assert out[1]["route"] == "blocked_domain"
    assert (out[2]["term_hits"], out[2]["route"]) \
        == (2, "blocked_content")
    # case-folded single hit stays under max_hits=2
    assert (out[3]["term_hits"], out[3]["route"]) == (1, "keep")
    # word boundary: casinogram is not casino
    assert (out[4]["term_hits"], out[4]["route"]) == (0, "keep")
    assert (out[5]["term_hits"], out[5]["route"]) == (0, "keep")


def test_fingerprint_diff_localizes_change(spark):
    from jsonschema_spark.operators.checks import (
        fingerprint_diff,
        row_fingerprint_hash,
    )

    old = spark.range(200).select(
        F.col("id"), (F.col("id") % 5).cast("string").alias("v"))
    # edit exactly one row: id 17
    new = old.withColumn(
        "v", F.when(F.col("id") == 17, F.lit("EDITED"))
        .otherwise(F.col("v")))
    d = fingerprint_diff(old, new, ["id", "v"], 16)
    changed = sorted(r["bucket"] for r in d.collect() if r["changed"])
    # the edited row's old and new renderings land in (at most) two
    # buckets; every other bucket proves itself unchanged
    exp = {r[0] for r in old.where("id = 17").select(
        row_fingerprint_hash(["id", "v"]) % 16).collect()}
    exp |= {r[0] for r in new.where("id = 17").select(
        row_fingerprint_hash(["id", "v"]) % 16).collect()}
    assert set(changed) == exp and 1 <= len(changed) <= 2
    # identical tables: nothing changed, counts intact
    same = fingerprint_diff(old, old, ["id", "v"], 16).collect()
    assert not any(r["changed"] for r in same)
    assert sum(r["old_rows"] for r in same) == 200


def test_check_suite_distinctness_approx(spark):
    from jsonschema_spark.operators.stats import distinct_approx

    # both columns sit in the raw-estimate regime (n_distinct well
    # above 2.5·m) — below it HLL linear-counting bias applies, which
    # hll_estimate documents as an engine-local correction
    df = spark.range(20000).select(
        F.col("id"), (F.col("id") % 2000).cast("string").alias("v"))
    checks = [
        {"name": "id_u", "check": "distinctness_approx", "col": "id",
         "min_ppm": 900_000, "p": 12},
        {"name": "v_card", "check": "distinctness_approx", "col": "v",
         "min_ppm": 900_000, "p": 8},
    ]
    got = {r["check_name"]: r for r in
           check_suite(df, checks).collect()}
    # metric must equal the standalone sketch estimate, in ppm of rows
    for name, col, p in (("id_u", "id", 12), ("v_card", "v", 8)):
        est = distinct_approx(df, col, p).collect()[0]["est_milli"]
        assert got[name]["metric"] == est * 1000 // 20000
    # the unique key passes (±2 % at p=12); the 10 %-cardinality
    # column fails the PK threshold (±7 % at p=8)
    assert got["id_u"]["status"] == "pass"
    assert abs(got["id_u"]["metric"] - 1_000_000) < 25_000
    assert got["v_card"]["status"] == "fail"
    assert abs(got["v_card"]["metric"] - 100_000) < 15_000
    # deterministic under repartitioning (pure set function)
    again = {r["check_name"]: r["metric"] for r in
             check_suite(df.repartition(13), checks).collect()}
    assert again == {k: v["metric"] for k, v in got.items()}


def test_suggest_checks_hand_computed_and_roundtrip(spark):
    from jsonschema_spark.operators.checks import suggest_checks

    df = spark.createDataFrame(
        [
            (1, "A", 2.5, None),
            (2, "B", -1.25, None),
            (3, "A", 7.0, None),
            (4, None, None, None),
        ],
        "pk long, cat string, x double, z string",
    )
    got = {(r["col_name"], r["check"]): r
           for r in suggest_checks(df).collect()}
    # pk: complete, unique, bounded
    assert got[("pk", "completeness")]["observed"] == 1_000_000
    assert ("pk", "distinctness") in got
    assert got[("pk", "min_ge")]["param"] == "1"
    assert got[("pk", "max_le")]["param"] == "4"
    # cat: 3/4 complete, 2-value domain, sorted CSV
    assert got[("cat", "completeness")]["observed"] == 750_000
    assert got[("cat", "contained_ppm")]["param"] == "A,B"
    assert ("cat", "distinctness") not in got  # A repeats
    # x: floor quantization of -1.25 -> -2
    assert got[("x", "min_ge")]["param"] == "-2"
    assert got[("x", "max_le")]["param"] == "7"
    # x IS a key candidate (3 distinct of 3 non-null)
    assert ("x", "distinctness") in got
    # all-null column: completeness 0, nothing else
    assert got[("z", "completeness")]["observed"] == 0
    assert not any(c == "z" and k != "completeness"
                   for c, k in got)

    # round-trip contract: the suggested suite passes on its own table
    from jsonschema_spark.operators.checks import check_suite
    checks = []
    for (c, k), r in got.items():
        if k == "completeness":
            checks.append({"name": f"{c}_{k}", "check": k, "col": c,
                           "min_ppm": int(r["param"])})
        elif k == "distinctness":
            checks.append({"name": f"{c}_{k}", "check": k, "col": c,
                           "min_ppm": int(r["param"])})
        elif k == "min_ge":
            checks.append({"name": f"{c}_{k}", "check": k, "col": c,
                           "ge": int(r["param"])})
        elif k == "max_le":
            checks.append({"name": f"{c}_{k}", "check": k, "col": c,
                           "le": int(r["param"])})
        elif k == "contained_ppm":
            checks.append({"name": f"{c}_{k}", "check": k, "col": c,
                           "allowed": r["param"].split(","),
                           "min_ppm": 1_000_000})
    res = check_suite(df, checks).collect()
    assert res and all(r["status"] == "pass" for r in res)


def test_check_drift_verdicts(spark):
    from jsonschema_spark.operators.checks import check_drift

    def res(rows):
        return spark.createDataFrame(
            rows, "check_name string, metric long, status string")

    old = res([("a", 10, "pass"), ("b", 5, "fail"),
               ("c", 7, "pass"), ("gone", 1, "pass")])
    new = res([("a", 12, "fail"), ("b", 9, "pass"),
               ("c", 7, "pass"), ("fresh", 3, "pass")])
    got = {r["check_name"]: r for r in
           check_drift(old, new).collect()}
    assert (got["a"]["verdict"], got["a"]["delta"]) == ("regressed", 2)
    assert got["b"]["verdict"] == "recovered"
    assert (got["c"]["verdict"], got["c"]["delta"]) == ("steady", 0)
    assert got["gone"]["verdict"] == "retired"
    assert got["fresh"]["verdict"] == "added"
    assert got["fresh"]["old_metric"] is None


def test_match_ppm_ceiling(spark):
    df = spark.createDataFrame(
        [("clean",), ("clean too",), ("PII 555-1234",)], "t string")
    got = {r["check_name"]: r for r in check_suite(df, [
        {"name": "pii_rate", "check": "match_ppm", "col": "t",
         "pattern": "[0-9]{3}-[0-9]{4}", "max_ppm": 100_000},
        {"name": "clean_rate", "check": "match_ppm", "col": "t",
         "pattern": "^clean", "min_ppm": 500_000},
    ]).collect()}
    # 1/3 = 333333 ppm > 10% ceiling -> fail; floor defaults to 0
    assert (got["pii_rate"]["metric"], got["pii_rate"]["lo"],
            got["pii_rate"]["status"]) == (333_333, 0, "fail")
    assert got["clean_rate"]["status"] == "pass"


def test_sampled_verdict_hand_computed(spark):
    from jsonschema_spark.operators.dedup import hash56
    from jsonschema_spark.operators.validate import sampled_verdict

    schema = {"required": ["k"],
              "properties": {"v": {"type": "integer", "minimum": 0}}}
    df = spark.createDataFrame(
        [(i, i - 5) for i in range(200)], "k long, v long")
    r = sampled_verdict(df, schema, "k", 300_000).collect()[0]
    # the sample is the exact hash-defined subset
    ins = df.where(
        (hash56(F.col("k").cast("string")) % 1_000_000) < 300_000)
    n_s = ins.count()
    n_bad = ins.where(F.col("v") < 0).count()
    assert (r["n_total"], r["n_sampled"]) == (200, n_s)
    assert r["n_invalid"] == n_bad
    assert r["n_valid"] == n_s - n_bad
    assert r["est_invalid_ppm"] == n_bad * 1_000_000 // n_s
    # determinism: identical under repartitioning
    r2 = sampled_verdict(df.repartition(7), schema, "k",
                         300_000).collect()[0]
    assert tuple(r) == tuple(r2)


def test_zero_denominator_guards(spark):
    # ADVICE r4: ANSI Spark throws DIVIDE_BY_ZERO even for double
    # division — empty-sample / no-qualifying-rows / all-NULL-group
    # must yield NULL metrics, not abort the job.
    from jsonschema_spark.operators.checks import benford_profile
    from jsonschema_spark.operators.stats import robust_outliers
    from jsonschema_spark.operators.validate import sampled_verdict

    schema = {"required": ["k"]}
    df = spark.createDataFrame([(i, i) for i in range(5)],
                               "k long, v long")
    # sample_ppm=0 selects nothing: est must be NULL, counts 0
    r = sampled_verdict(df, schema, "k", 0).collect()[0]
    assert (r["n_total"], r["n_sampled"], r["est_invalid_ppm"]) \
        == (5, 0, None)

    # no rows with |x| >= 1: all 9 digit rows, NULL observed/dev
    frac = spark.createDataFrame([(0.5,), (-0.25,), (None,)],
                                 "x double")
    prof = benford_profile(frac, "x").collect()
    assert len(prof) == 9
    assert all(p["n_rows"] == 0 and p["observed_ppm"] is None
               and p["dev_ppm"] is None for p in prof)

    # group whose values are all NULL: n_rows 0, NULL ppm
    g = spark.createDataFrame([("a", None), ("a", None), ("b", 1.0)],
                              "g string, x double")
    got = {r["g"]: r for r in robust_outliers(g, "g", "x").collect()}
    assert (got["a"]["n_rows"], got["a"]["outlier_ppm"]) == (0, None)
    assert got["b"]["n_rows"] == 1


def test_violation_pareto_hand_computed(spark):
    from jsonschema_spark.operators.validate import violation_pareto

    schema = {
        "required": ["k"],
        "properties": {
            "v": {"type": "integer", "minimum": 0},
            "s": {"type": "string", "maxLength": 2},
        },
    }
    rows = ([(i, -1, "ok") for i in range(5)]        # 5 minimum fails
            + [(100 + i, 1, "long") for i in range(3)]  # 3 maxLength
            + [(200, 2, "ok")])                      # clean
    df = spark.createDataFrame(rows, "k long, v long, s string")
    got = violation_pareto(df, schema, ["k"], k=2).collect()
    assert [r["rnk"] for r in got] == [1, 2]
    # the parent /properties applicator entry fires once per failing
    # row (5 + 3), outranking the 5 leaf minimum rows
    assert (got[0]["keywordLocation"], got[0]["n_violations"]) \
        == ("/properties", 8)
    assert "minimum" in got[1]["keywordLocation"]
    assert got[1]["n_violations"] == 5
    total = sum(r["n_violations"] for r in
                violation_pareto(df, schema, ["k"], k=100).collect())
    assert got[0]["share_ppm"] == 8 * 1_000_000 // total


def test_salted_join_equals_plain_join(spark):
    from jsonschema_spark.operators.referential import salted_join

    fact = spark.createDataFrame(
        # hot key 1 (6 rows), key 2, an orphan 9, a NULL key
        [(1, i) for i in range(6)] + [(2, 10), (9, 11), (None, 12)],
        "k long, fv long")
    dim = spark.createDataFrame(
        # duplicate dim key 1 (two rows) + key 2 + unmatched 3
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "dk long, dv string")
    plain = sorted(map(tuple, fact.join(
        dim, fact["k"] == dim["dk"], "inner").collect()))
    salted = sorted(map(tuple, salted_join(
        fact, dim, "k", "dk", n_salts=4).collect()))
    assert salted == plain
    assert len(salted) == 6 * 2 + 1  # hot key x dup dim + key 2


def test_triangle_counts_hand_computed(spark):
    from jsonschema_spark.operators.linkgraph import triangle_counts

    edges = spark.createDataFrame(
        # K4 on a,b,c,d (one edge reversed + one duplicated), a
        # self-loop, a dangling edge, and a NULL edge
        [("a", "b"), ("a", "c"), ("a", "d"), ("c", "b"), ("b", "d"),
         ("c", "d"), ("a", "b"), ("e", "e"), ("d", "x"), (None, "y")],
        "src string, dst string")
    got = {r["host"]: r["n_triangles"]
           for r in triangle_counts(edges).collect()}
    # K4 has C(4,3)=4 triangles; each node sits in C(3,2)=3
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}
    # triangle-free graph: empty result
    chain = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string")
    assert triangle_counts(chain).count() == 0


def test_cms_join_size_hand_computed(spark):
    from jsonschema_spark.operators.stats import cms_join_size, cms_sketch

    # exact |A join B| = sum_k cA(k)*cB(k) = 3*2 + 1*1 = 7
    a = spark.createDataFrame(
        [("x",), ("x",), ("x",), ("y",), ("z",)], "k string")
    b = spark.createDataFrame([("x",), ("x",), ("y",)], "k string")
    d, w = 4, 64
    est = cms_join_size(cms_sketch(a, "k", d, w),
                        cms_sketch(b, "k", d, w), d) \
        .collect()[0]["est_join_rows"]
    # CMS only over-counts; at 3 keys in 64 buckets collisions are
    # rare but legal — the estimate is an upper bound near 7
    assert 7 <= est <= 7 + 3 * 5
    # disjoint key sets: every row's dot is 0 -> est 0 (the missing-
    # row left-join guard, not a silent min over joined rows only)
    c = spark.createDataFrame([("q",), ("r",)], "k string")
    est0 = cms_join_size(cms_sketch(a, "k", d, w),
                         cms_sketch(c, "k", d, w), d) \
        .collect()[0]["est_join_rows"]
    assert est0 >= 0 and est0 <= 4  # 0 unless a rare bucket collision


def test_check_suite_hypothesis_vs_python_mirror(spark):
    """Property net: on random small tables, every algebraic
    check_suite metric equals a pure-Python mirror computing the same
    integer recipes (ppm floors, per-row quantization, one-IEEE-op
    mean)."""
    import math as m

    import re as _re

    from hypothesis import given, settings, strategies as st

    vals = st.tuples(
        st.one_of(st.none(), st.integers(-10**6, 10**6)),
        st.one_of(st.none(), st.sampled_from(["a", "ab", "b", "c"])),
        st.one_of(st.none(),
                  st.floats(allow_nan=False, allow_infinity=False,
                            min_value=-1e6, max_value=1e6, width=64)),
    )
    checks = [
        {"name": "n", "check": "size_min", "min": 1},
        {"name": "c", "check": "completeness", "col": "v",
         "min_ppm": 500_000},
        {"name": "d", "check": "distinctness", "col": "i",
         "min_ppm": 500_000},
        {"name": "mn", "check": "min_ge", "col": "x",
         "scale": 100, "ge": 0},
        {"name": "mx", "check": "max_le", "col": "x",
         "scale": 100, "le": 0},
        {"name": "me", "check": "mean_scaled_between", "col": "x",
         "scale": 100, "lo": -10**10, "hi": 10**10},
        {"name": "rx", "check": "match_ppm", "col": "v",
         "pattern": "^a", "min_ppm": 1},
        {"name": "in", "check": "contained_ppm", "col": "v",
         "allowed": ["a", "b"], "max_ppm": 900_000},
    ]

    def mirror(rows):
        n = len(rows)
        ints = [r[0] for r in rows if r[0] is not None]
        strs = [r[1] for r in rows if r[1] is not None]
        xs = [m.floor(r[2] * 100.0) for r in rows if r[2] is not None]
        out = {"n": n}
        out["c"] = (len(strs) * 1_000_000) // n
        out["d"] = (len(set(ints)) * 1_000_000) // n
        out["mn"] = min(xs) if xs else None
        out["mx"] = max(xs) if xs else None
        out["me"] = m.floor(sum(xs) / len(xs)) if xs else None
        nrx = sum(1 for s in strs if _re.search("^a", s))
        out["rx"] = (nrx * 1_000_000) // len(strs) if strs else None
        nin = sum(1 for s in strs if s in ("a", "b"))
        out["in"] = (nin * 1_000_000) // len(strs) if strs else None
        return out

    @settings(max_examples=10, deadline=None)
    @given(st.lists(vals, min_size=1, max_size=12))
    def run(rows):
        df = spark.createDataFrame(rows, "i long, v string, x double")
        got = {r["check_name"]: r["metric"]
               for r in check_suite(df, checks).collect()}
        assert got == mirror(rows)

    run()


def test_fd_compliance_hand_computed(spark):
    from jsonschema_spark.operators.checks import fd_compliance

    df = spark.createDataFrame(
        # key 1: majority x (3 of 4); key 2: perfect; key 3: 1-1 tie
        [(1, "x"), (1, "x"), (1, "x"), (1, "y"),
         (2, "x"), (2, "x"), (3, "a"), (3, "b")],
        "k long, r string")
    r = fd_compliance(df, ["k"], "r").collect()[0]
    # compliant = 3 + 2 + 1 (tie: only the max count matters)
    assert (r["n_rows"], r["n_keys"], r["compliant_rows"]) == (8, 3, 6)
    assert r["compliance_ppm"] == 750_000
    # a perfect FD reads exactly 1e6
    perfect = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "y")], "k long, r string")
    assert fd_compliance(perfect, ["k"], "r") \
        .collect()[0]["compliance_ppm"] == 1_000_000


def test_json_key_census_hand_computed(spark):
    from jsonschema_spark.operators.checks import json_key_census

    df = spark.createDataFrame(
        [('{"a": 1, "b": 2}',), ('{"a": 3}',), ('[1]',),
         ("oops",), (None,), ("{}",)],
        "p string")
    got = {r["json_key"]: r for r in
           json_key_census(df, "p").collect()}
    assert set(got) == {"a", "b"}
    # presence is of ALL 6 rows — malformed/array/null/empty count
    # against it (the contract consumer's view)
    assert (got["a"]["n_rows"], got["a"]["presence_ppm"]) \
        == (2, 333_333)
    assert (got["b"]["n_rows"], got["b"]["presence_ppm"]) \
        == (1, 166_666)


def test_benford_profile_hand_computed(spark):
    from jsonschema_spark.operators.checks import (
        BENFORD_PPM,
        benford_profile,
    )

    df = spark.createDataFrame(
        # digits: 1,1,2,9, plus excluded rows (|x|<1, null);
        # -250.3 -> digit 2, 0.5 excluded
        [(1.0,), (19.9,), (-250.3,), (900.0,), (0.5,), (None,),
         (-0.99,)],
        "x double")
    got = {r["digit"]: r for r in
           benford_profile(df, "x").collect()}
    assert set(got) == set(range(1, 10))  # spine pins all 9 rows
    assert got[1]["n_rows"] == 2 and got[2]["n_rows"] == 1
    assert got[9]["n_rows"] == 1
    assert all(got[d]["n_rows"] == 0 for d in (3, 4, 5, 6, 7, 8))
    assert got[1]["observed_ppm"] == 500_000
    assert got[1]["dev_ppm"] == 500_000 - BENFORD_PPM[0]
    assert got[3]["dev_ppm"] == -BENFORD_PPM[2]
    # a genuinely Benford-ish sample: powers 2^k lead-digit
    # distribution is the classical convergent case
    pw = spark.createDataFrame([(float(2 ** k),) for k in range(1, 64)],
                               "x double")
    prof = {r["digit"]: r for r in benford_profile(pw, "x").collect()}
    dev = sum(abs(prof[d]["dev_ppm"]) for d in range(1, 10))
    # count granularity at n=63 is 1/63 ≈ 15.9k ppm per digit; the
    # observed L1 ≈ 177k is ~1.2 counts/digit off the law — convergent
    assert dev < 250_000
    # and an all-constant column maximally violates it
    const = spark.createDataFrame([(5.0,)] * 50, "x double")
    cdev = sum(abs(r["dev_ppm"]) for r in
               benford_profile(const, "x").collect())
    assert cdev > 1_300_000


def test_check_suite_composite_distinctness(spark):
    df = spark.createDataFrame(
        # pairs: (1,a) x2, (1,b), (2,a), (2,NULL), (NULL,NULL) -> 5
        # distinct renderings of 6 rows
        [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, None),
         (None, None)],
        "k long, v string")
    got = check_suite(df, [
        {"name": "pair", "check": "distinctness", "cols": ["k", "v"],
         "min_ppm": 900_000},
    ]).collect()[0]
    assert got["col_name"] == "k,v"
    # NULL-bearing pairs COUNT as renderings (unlike SQL multi-col
    # count distinct, which drops any-NULL rows)
    assert got["metric"] == 5 * 1_000_000 // 6
    assert got["status"] == "fail"


def test_check_suite_grouped_hand_computed(spark):
    df = spark.createDataFrame(
        [("en", 1, "a"), ("en", 2, "a"), ("en", 2, None),
         ("fr", 3, "b"), ("fr", 3, "b"), (None, 9, "a")],
        "g string, id long, v string")
    suite = [
        {"name": "size", "check": "size_min", "min": 3},
        {"name": "v_comp", "check": "completeness", "col": "v",
         "min_ppm": 700_000},
        {"name": "id_pk", "check": "distinctness", "col": "id",
         "min_ppm": 1_000_000},
        {"name": "v_dom", "check": "contained_ppm", "col": "v",
         "allowed": ["a"], "min_ppm": 500_000},
    ]
    out = check_suite(df, suite, by=["g"])
    rows = {(r["g"], r["check_name"]): r for r in out.collect()}
    # 3 groups (NULL key gets its own suite) x 4 checks
    assert len(rows) == 12
    assert (rows[("en", "size")]["metric"],
            rows[("en", "size")]["status"]) == (3, "pass")
    assert rows[("fr", "size")]["status"] == "fail"
    assert rows[(None, "size")]["metric"] == 1
    # en: 2 non-null v of 3 rows -> floor(2e6/3)
    assert rows[("en", "v_comp")]["metric"] == 666_666
    assert rows[("en", "v_comp")]["status"] == "fail"
    assert rows[("fr", "v_comp")]["metric"] == 1_000_000
    # en distinct ids {1,2} of 3; fr {3} of 2; NULL-group {9} of 1
    assert rows[("en", "id_pk")]["metric"] == 666_666
    assert rows[("fr", "id_pk")]["metric"] == 500_000
    assert (rows[(None, "id_pk")]["metric"],
            rows[(None, "id_pk")]["status"]) == (1_000_000, "pass")
    # domain ppm is of NON-NULL values: en 2/2, fr 0/2
    assert (rows[("en", "v_dom")]["metric"],
            rows[("en", "v_dom")]["status"]) == (1_000_000, "pass")
    assert (rows[("fr", "v_dom")]["metric"],
            rows[("fr", "v_dom")]["status"]) == (0, "fail")
    # grouped output equals per-group global suites (slice-equivalence)
    solo = check_suite(df.where(F.col("g") == "en"), suite).collect()
    assert sorted((r["check_name"], r["metric"], r["status"])
                  for r in solo) == \
        sorted((k[1], r["metric"], r["status"])
               for k, r in rows.items() if k[0] == "en")
    # HLL sketch folds one global row; grouped mode must reject it
    with pytest.raises(ValueError, match="global-only"):
        check_suite(df, [
            {"name": "x", "check": "distinctness_approx", "col": "id",
             "min_ppm": 1, "p": 12}], by=["g"])


def test_contingency_chi2_hand_computed(spark):
    from jsonschema_spark.operators.stats import contingency_chi2
    rows = ([("x", "p")] * 30 + [("x", "q")] * 10
            + [("y", "p")] * 10 + [("y", "q")] * 50)
    df = spark.createDataFrame(rows, "a string, b string")
    got = contingency_chi2(df, "a", "b").collect()[0]
    # exp: 16/24/24/36; per-cell floor(1e6*(obs*n-rt*ct)^2/(rt*ct*n))
    assert got["n_rows"] == 100 and got["dof"] == 1
    assert got["chi2_ppm"] == 12_250_000 + 8_166_666 * 2 + 5_444_444
    # v = sqrt(34.027776/100) = 0.58333...
    assert got["cramers_v_milli"] == 583

    # exact independence: uniform cross product -> chi2 == 0
    import pyspark.sql.functions as F
    ind = spark.range(60).select(
        (F.col("id") % 2).cast("string").alias("a"),
        (F.col("id") % 3).cast("string").alias("b"))
    g0 = contingency_chi2(ind, "a", "b").collect()[0]
    assert g0["chi2_ppm"] == 0 and g0["cramers_v_milli"] == 0

    # constant margin -> dof 0, NULL V; NULL is a real category
    c = spark.createDataFrame(
        [("x", "p"), ("x", "q"), (None, "p")], "a string, b string")
    gc = contingency_chi2(c, "a", "b").collect()[0]
    assert gc["n_a"] == 2  # x and <NULL>
    one = contingency_chi2(
        spark.createDataFrame([("x", "p"), ("x", "q")],
                              "a string, b string"), "a", "b"
    ).collect()[0]
    assert one["dof"] == 0 and one["cramers_v_milli"] is None


def test_contingency_chi2_python_mirror(spark):
    """Random-ish table vs an exact-int python mirror of the per-cell
    recipe (incl. zero-observed cells contributing expected mass)."""
    import math
    from collections import Counter

    from jsonschema_spark.operators.stats import contingency_chi2
    rows = [(f"a{(i * 7) % 5}", f"b{(i * i) % 3}") for i in range(997)]
    cnt = Counter(rows)
    ra = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    n = len(rows)
    chi2 = 0
    for a in ra:
        for b in cb:
            d = cnt.get((a, b), 0) * n - ra[a] * cb[b]
            chi2 += math.floor(
                float(d) * d * 1_000_000.0 / (float(ra[a]) * cb[b] * n))
    df = spark.createDataFrame(rows, "a string, b string")
    got = contingency_chi2(df, "a", "b").collect()[0]
    assert got["chi2_ppm"] == chi2
    # squares mod 3 are only {0, 1}: n_b == 2
    assert (got["n_a"], got["n_b"], got["n_rows"]) == (5, 2, 997)
    mind = min(5 - 1, 2 - 1)
    assert got["cramers_v_milli"] == math.floor(
        math.sqrt(chi2 / (float(n) * mind * 1_000_000.0)) * 1000.0)


def test_volume_trend_hand_computed(spark):
    from datetime import datetime

    from jsonschema_spark.operators.stats import volume_trend

    def mk(rows):
        return spark.createDataFrame(
            [(datetime.fromisoformat(s),) for s in rows],
            "ts timestamp")

    # counts 1,2,3,4 across four days -> slope exactly 1.0/day
    up = mk(["2024-01-01 08:00:00"]
            + ["2024-01-02 08:00:00"] * 2
            + ["2024-01-03 08:00:00"] * 3
            + ["2024-01-04 08:00:00"] * 4)
    r = volume_trend(up, "ts").collect()[0]
    assert (r["n_buckets"], r["total_rows"], r["slope_milli"]) \
        == (4, 10, 1000)
    assert (r["first_bucket"], r["last_bucket"]) \
        == ("2024-01-01", "2024-01-04")

    # gap day counts as ZERO volume: y = [2,4,0,6] -> slope 0.8
    gap = mk(["2024-01-01 08:00:00"] * 2 + ["2024-01-02 08:00:00"] * 4
             + ["2024-01-04 08:00:00"] * 6)
    g = volume_trend(gap, "ts").collect()[0]
    assert (g["n_buckets"], g["slope_milli"]) == (4, 800)

    # single bucket: NULL slope
    one = volume_trend(mk(["2024-01-01 01:00:00"] * 5), "ts") \
        .collect()[0]
    assert one["n_buckets"] == 1 and one["slope_milli"] is None

    # monthly spine fills Feb with zero: y=[2,0,4] -> slope 1.0
    mo = mk(["2024-01-10 00:00:00"] * 2 + ["2024-03-05 00:00:00"] * 4)
    m = volume_trend(mo, "ts", unit="month").collect()[0]
    assert (m["n_buckets"], m["slope_milli"]) == (3, 1000)


def test_volume_anomaly_hand_computed(spark):
    from datetime import datetime

    from jsonschema_spark.operators.stats import volume_anomaly

    rows = (["2024-01-01"] * 10 + ["2024-01-02"] * 10
            + ["2024-01-03"] * 10 + ["2024-01-05"] * 30)  # 01-04 silent
    df = spark.createDataFrame(
        [(datetime.fromisoformat(s + " 12:00:00"),) for s in rows],
        "ts timestamp")
    got = {r["bucket"]: r for r in
           volume_anomaly(df, "ts", z_milli_threshold=1200).collect()}
    assert len(got) == 5  # zero-filled spine includes the silent day
    # y=[10,10,10,0,30]: n=5 sy=60 syy=1200 var=2400 sqrt=48.9898
    assert got["2024-01-04"]["n_rows"] == 0
    assert got["2024-01-04"]["z_milli"] == -1225  # floor(-1224.74)
    assert got["2024-01-04"]["status"] == "low"
    assert got["2024-01-05"]["z_milli"] == 1837
    assert got["2024-01-05"]["status"] == "high"
    assert got["2024-01-01"]["z_milli"] == -205  # floor(-204.12)
    assert got["2024-01-01"]["status"] == "ok"
    # zero variance -> NULL z, 'ok'
    flat = spark.createDataFrame(
        [(datetime.fromisoformat("2024-01-0%d 00:00:00" % d),)
         for d in (1, 2, 3)], "ts timestamp")
    fz = volume_anomaly(flat, "ts").collect()
    assert all(r["z_milli"] is None and r["status"] == "ok" for r in fz)


def test_ab_test_hand_computed(spark):
    import math

    from jsonschema_spark.operators.stats import ab_test
    rows = ([(True, True)] * 30 + [(True, False)] * 20
            + [(False, True)] * 20 + [(False, False)] * 30)
    df = spark.createDataFrame(rows, "v boolean, s boolean")
    r = ab_test(df, F.col("v"), F.col("s")).collect()[0]
    assert (r["n_a"], r["n_b"], r["succ_a"], r["succ_b"]) \
        == (50, 50, 30, 20)
    assert r["rate_a_ppm"] == 600_000 and r["rate_b_ppm"] == 400_000
    # python float mirror of the EXACT op order
    pa, pb, pp = 30 / 50, 20 / 50, 50 / 100
    z = math.floor((pa - pb) * 1000.0
                   / math.sqrt(pp * (1.0 - pp) * (1.0 / 50 + 1.0 / 50)))
    assert r["z_milli"] == z
    # NULL success counts as failure; empty arm -> NULL z
    d2 = spark.createDataFrame([(True, None), (True, True)],
                               "v boolean, s boolean")
    r2 = ab_test(d2, F.col("v"), F.coalesce(F.col("s"), F.lit(False))
                 ).collect()[0]
    assert (r2["n_a"], r2["succ_a"], r2["n_b"]) == (2, 1, 0)
    assert r2["z_milli"] is None and r2["rate_b_ppm"] is None


def test_group_median_mad_hand_computed(spark):
    from jsonschema_spark.operators.stats import group_median_mad
    rows = [("g", float(i)) for i in range(1, 11)] \
        + [("h", 2.0), ("h", 4.0), ("h", None)]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {r["g"]: r for r in
           group_median_mad(df, "g", "x").collect()}
    # 1..10: median 5.5; |x-5.5| medians to 2.5
    assert (got["g"]["n_rows"], got["g"]["median_milli"],
            got["g"]["mad_milli"]) == (10, 5500, 2500)
    # h: median 3.0, deviations [1,1] -> MAD 1.0; NULL dropped
    assert (got["h"]["n_rows"], got["h"]["median_milli"],
            got["h"]["mad_milli"]) == (2, 3000, 1000)


def test_activity_heatmap_hand_computed(spark):
    from datetime import datetime

    from jsonschema_spark.operators.stats import activity_heatmap
    df = spark.createDataFrame(
        [(datetime.fromisoformat("2024-01-01 10:15:00"),),  # Monday
         (datetime.fromisoformat("2024-01-01 10:45:00"),),
         (datetime.fromisoformat("2024-01-07 23:59:59"),)],  # Sunday
        "ts timestamp")
    got = {(r["dow"], r["hour"]): r for r in
           activity_heatmap(df, "ts").collect()}
    assert len(got) == 168  # full 7x24 spine
    assert got[(1, 10)]["n_rows"] == 2   # ISO Monday = 1
    assert got[(1, 10)]["share_ppm"] == 666_666
    assert got[(7, 23)]["n_rows"] == 1   # ISO Sunday = 7
    assert got[(2, 10)]["n_rows"] == 0
    assert got[(2, 10)]["share_ppm"] == 0


def test_robust_outliers_hand_computed(spark):
    from jsonschema_spark.operators.stats import robust_outliers
    # group g: 1..9 plus a 1000.0 spike and a -1000.0 dip
    rows = [("g", float(i)) for i in range(1, 10)] \
        + [("g", 1000.0), ("g", -1000.0), ("g", None)] \
        + [("h", 5.0)] * 4  # zero MAD: flags nothing
    df = spark.createDataFrame(rows, "g string, x double")
    got = {r["g"]: r for r in
           robust_outliers(df, "g", "x").collect()}
    # g: 11 non-null; median 5.0 (6 of 11), MAD = 3.0
    # z(1000) = .6745*995/3 = 223.7k milli >> 3500; z(9)=0.9k ok
    assert (got["g"]["n_rows"], got["g"]["n_out_low"],
            got["g"]["n_out_high"]) == (11, 1, 1)
    assert got["g"]["outlier_ppm"] == 2_000_000 // 11
    assert (got["h"]["n_rows"], got["h"]["n_out_low"],
            got["h"]["n_out_high"], got["h"]["outlier_ppm"]) \
        == (4, 0, 0, 0)
