"""t-digest quantile sketch (operators/stats.py).

The adaptive-accuracy sibling of hist_sketch: accuracy bounds on a
200k-value heavy-tailed corpus, merge==rollup accuracy, bounded state,
weight conservation, NULL handling and edge cases. The sketch is
engine-private by design (centroid placement depends on partitioning);
these tests pin the ACCURACY contract the driver query's rank_ok bound
relies on.
"""
import numpy as np
import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators.stats import (
    tdigest_merge,
    tdigest_quantile_py,
    tdigest_quantiles,
    tdigest_sketch,
)

PS = (0.001, 0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999)


def _corpus(spark, n=200_000, parts=16):
    """Deterministic heavy-tailed values, identical in Spark and numpy:
    u_i = ((i*2654435761) mod 2^32)/2^32, x = -ln(1-u) (Exp(1))."""
    u = F.pmod(F.col("id") * F.lit(2654435761), F.lit(2**32)) / F.lit(2.0**32)
    df = spark.range(n).repartition(parts).select(
        (-F.log(F.lit(1.0) - u)).alias("x"))
    i = np.arange(n, dtype=np.int64)
    un = ((i * 2654435761) % 2**32) / 2.0**32
    return df, np.sort(-np.log(1.0 - un))


@pytest.fixture(scope="module")
def built(spark):
    df, sv = _corpus(spark)
    sk = tdigest_sketch(df, "x", compression=100)
    row = sk.collect()[0]
    return df, sv, sk, row


def test_tdigest_bounded_state_and_conservation(built):
    _, _, _, row = built
    assert len(row["centroids"]) <= 100
    assert sum(c["weight"] for c in row["centroids"]) == 200_000
    assert row["n_rows"] == 200_000
    means = [c["mean"] for c in row["centroids"]]
    assert means == sorted(means)


def test_tdigest_rank_accuracy(built):
    _, sv, sk, _ = built
    qs = {r["p_ppm"]: r["q_est"] for r in
          tdigest_quantiles(sk, PS).collect()}
    for p in PS:
        est = qs[int(p * 1e6)]
        rank = np.searchsorted(sv, est) / len(sv)
        assert abs(rank - p) < 0.005, (p, est, rank)


def test_tdigest_merge_rollup_accuracy(spark, built):
    df, sv, _, _ = built
    # split the same corpus by parity of a derived bit and re-merge
    a = tdigest_sketch(df.where(F.col("x") < 0.7), "x")
    b = tdigest_sketch(df.where(F.col("x") >= 0.7), "x")
    merged = tdigest_merge(a, b).collect()[0]
    assert sum(c["weight"] for c in merged["centroids"]) == 200_000
    assert len(merged["centroids"]) <= 100
    for p in (0.01, 0.5, 0.99):
        est = tdigest_quantile_py(merged["centroids"], merged["n_rows"], p)
        rank = np.searchsorted(sv, est) / len(sv)
        assert abs(rank - p) < 0.005, (p, est, rank)


def test_tdigest_nulls_and_small(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (2.0,), (3.0,), (None,)], "x double")
    row = tdigest_sketch(df, "x").collect()[0]
    assert row["n_rows"] == 3
    assert sum(c["weight"] for c in row["centroids"]) == 3
    # exact on tiny inputs: every value its own centroid
    assert tdigest_quantile_py(row["centroids"], 3, 0.5) == 2.0
    assert tdigest_quantile_py(row["centroids"], 3, 0.0) == 1.0
    assert tdigest_quantile_py(row["centroids"], 3, 1.0) == 3.0


def test_tdigest_empty_and_validation(spark):
    df = spark.createDataFrame([], "x double")
    row = tdigest_sketch(df, "x").collect()[0]
    assert row["n_rows"] == 0 and list(row["centroids"]) == []
    assert np.isnan(tdigest_quantile_py([], 0, 0.5))
    with pytest.raises(ValueError):
        tdigest_sketch(df, "x", compression=5)


def test_tdigest_partitioning_insensitivity(spark):
    """Estimates from different partitionings agree within the bound
    (state differs; the CONTRACT is the quantile envelope)."""
    df1, sv = _corpus(spark, n=50_000, parts=4)
    df2, _ = _corpus(spark, n=50_000, parts=37)
    q1 = {r["p_ppm"]: r["q_est"] for r in tdigest_quantiles(
        tdigest_sketch(df1, "x"), (0.1, 0.5, 0.9)).collect()}
    q2 = {r["p_ppm"]: r["q_est"] for r in tdigest_quantiles(
        tdigest_sketch(df2, "x"), (0.1, 0.5, 0.9)).collect()}
    for k in q1:
        p = k / 1e6
        r1 = np.searchsorted(sv, q1[k]) / len(sv)
        r2 = np.searchsorted(sv, q2[k]) / len(sv)
        assert abs(r1 - p) < 0.005 and abs(r2 - p) < 0.005
