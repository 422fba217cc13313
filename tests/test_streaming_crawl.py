"""The crawl-ingest path under Structured Streaming.

warc_records (JVM path), charset_guess, main_content_df and the
validator are all stateless per-row projections/generations, so they
compose into a readStream pipeline unchanged — this proves it: a file
stream of WARC blobs drains through extract → decode-sniff →
main-content → validate and produces exactly the batch result.
"""
from pyspark.sql import functions as F

from jsonschema_spark.operators.htmltext import charset_guess, main_content_df
from jsonschema_spark.sources.warc import warc_records


def _rec(uri, body):
    return (f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {uri}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n{body}\r\n\r\n")


def _pipeline(df):
    recs = warc_records(df, "file_id", "warc")
    pages = recs.select(
        (F.col("file_id") * 1000 + F.col("rec_idx")).alias("uid"),
        "file_id", "rec_idx", "target_uri",
        F.col("payload").alias("html"),
    )
    cs = charset_guess(pages, id_col="uid", html_col="html", binary=False)
    mc = main_content_df(pages, id_col="uid", html_col="html",
                         binary=False, min_chars=10)
    return (
        pages.select("uid", "file_id", "rec_idx", "target_uri")
        .join(cs.select("uid", "charset"), "uid")
        .join(mc.select("uid", "n_blocks_kept", "n_chars"), "uid")
    )


def test_warc_pipeline_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "warcs")
    files = []
    for f in range(4):
        body = "".join(
            _rec(f"https://h{f}.org/p{i}",
                 f"<meta charset='utf8'><p>page {f}-{i} long enough prose "
                 f"paragraph body</p><div>x</div>")
            for i in range(3)
        )
        files.append((f, body))
    batch = spark.createDataFrame(files, "file_id: long, warc: string")
    batch.write.parquet(src)

    want = {
        (r["file_id"], r["rec_idx"]): (r["target_uri"], r["charset"],
                                       r["n_blocks_kept"], r["n_chars"])
        for r in _pipeline(batch).collect()
    }
    assert len(want) == 12
    assert all(v[1] == "utf-8" and v[2] == 1 for v in want.values())

    # main_content_df reassembles blocks with a per-document groupBy; a
    # document arrives WHOLE in one micro-batch, so the streaming form is
    # foreachBatch (per-batch-complete aggregation — no unbounded state,
    # no watermark needed). This is the documented pattern for stateless-
    # per-record pipelines that contain an intra-record aggregation.
    collected = []

    def sink(bdf, _epoch):
        collected.extend(_pipeline(bdf).collect())

    sdf = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        sdf.writeStream.foreachBatch(sink)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["file_id"], r["rec_idx"]): (r["target_uri"], r["charset"],
                                       r["n_blocks_kept"], r["n_chars"])
        for r in collected
    }
    assert got == want


def test_stream_hll_sketch_equals_batch(spark, tmp_path):
    """The streaming distinct-url sketch drained over MULTIPLE micro-
    batches (maxFilesPerTrigger=1 forces cross-batch state merging) is
    bit-identical to the batch sketch over the union — and the estimate
    applied to the streamed state matches too. State = 2^p rows, bounded
    forever."""
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.stats import hll_estimate, hll_sketch
    from jsonschema_spark.streaming.validate import stream_hll_sketch

    src = str(tmp_path / "urls")
    parts = []
    for f in range(3):
        part = spark.range(f * 4000, (f + 1) * 4000 + 500).select(
            F.concat(F.lit("https://h"), (F.col("id") % 97).cast("string"),
                     F.lit(".org/p"), F.col("id").cast("string")).alias("url"))
        part.write.mode("append").parquet(src)
        parts.append(part)
    batch = spark.read.parquet(src)

    p = 8
    want = sorted(
        (r["bucket"], r["max_rank"]) for r in hll_sketch(batch, "url", p).collect()
    )

    sdf = (spark.readStream.schema(batch.schema)
           .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream_hll_sketch(sdf, "url", p)
         .writeStream.outputMode("complete")
         .format("memory").queryName("hll_stream")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    streamed = spark.table("hll_stream")
    got = sorted((r["bucket"], r["max_rank"]) for r in streamed.collect())
    assert got == want
    est_b = hll_estimate(hll_sketch(batch, "url", p), p).first()
    est_s = hll_estimate(streamed, p).first()
    assert tuple(est_s) == tuple(est_b)


def test_stream_cms_and_hist_equal_batch(spark, tmp_path):
    """Streaming count-min and histogram sketches drained over multiple
    micro-batches equal the batch sketches bit-for-bit (integer sums are
    order-free), and the batch lookup/quantile extractors apply to the
    streamed state unchanged."""
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.stats import (
        cms_lookup, cms_sketch, hist_quantiles, hist_sketch)
    from jsonschema_spark.streaming.validate import (
        stream_cms_sketch, stream_hist_sketch)

    src = str(tmp_path / "vals")
    for f in range(3):
        spark.range(f * 3000, (f + 1) * 3000).select(
            F.concat(F.lit("t"), (F.col("id") % 77).cast("string")).alias("s"),
            (F.col("id") % 991).alias("v"),
        ).write.mode("append").parquet(src)
    batch = spark.read.parquet(src)

    sdf = (spark.readStream.schema(batch.schema)
           .option("maxFilesPerTrigger", 1).parquet(src))
    qc = (stream_cms_sketch(sdf, "s", 3, 64)
          .writeStream.outputMode("complete").format("memory")
          .queryName("cms_stream").trigger(availableNow=True).start())
    qc.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.table("cms_stream").collect())
    want = sorted(tuple(r) for r in cms_sketch(batch, "s", 3, 64).collect())
    assert got == want
    items = batch.select("s").distinct()
    est_s = sorted(tuple(r) for r in
                   cms_lookup(spark.table("cms_stream"), items, "s", 3, 64).collect())
    est_b = sorted(tuple(r) for r in
                   cms_lookup(cms_sketch(batch, "s", 3, 64), items, "s", 3, 64).collect())
    assert est_s == est_b

    qh = (stream_hist_sketch(sdf, "v", 0, 1000, 40)
          .writeStream.outputMode("complete").format("memory")
          .queryName("hist_stream").trigger(availableNow=True).start())
    qh.awaitTermination(120)
    goth = sorted(tuple(r) for r in spark.table("hist_stream").collect())
    wanth = sorted(tuple(r) for r in hist_sketch(batch, "v", 0, 1000, 40).collect())
    assert goth == wanth
    qs = hist_quantiles(spark.table("hist_stream"), 0, 1000, 40, (500_000,)).first()
    qb = hist_quantiles(hist_sketch(batch, "v", 0, 1000, 40), 0, 1000, 40, (500_000,)).first()
    assert tuple(qs) == tuple(qb)


def test_stream_bloom_equals_batch(spark, tmp_path):
    """Streaming Bloom membership state drained over multiple micro-
    batches yields the SAME bit set as the batch sketch (set union is
    order-free; state ≤ m_bits forever), and batch bloom_probe applies
    to the streamed state unchanged: no false negatives on streamed-in
    members."""
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.stats import bloom_probe, bloom_sketch
    from jsonschema_spark.streaming.validate import stream_bloom_sketch

    src = str(tmp_path / "burls")
    for f in range(3):
        spark.range(f * 300, (f + 1) * 300).select(
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("url")
        ).write.mode("append").parquet(src)
    batch = spark.read.parquet(src)

    m, kh = 4096, 3
    want = sorted(r["bit"] for r in bloom_sketch(batch, "url", m, kh).collect())

    sdf = (spark.readStream.schema(batch.schema)
           .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream_bloom_sketch(sdf, "url", m, kh)
         .writeStream.outputMode("complete")
         .format("memory").queryName("bloom_stream")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    streamed = spark.table("bloom_stream")
    assert sorted(r["bit"] for r in streamed.collect()) == want
    assert streamed.agg(F.sum("n")).first()[0] == 900 * kh
    pm = bloom_probe(streamed, batch, "url", m, kh)
    assert pm.where(~F.col("maybe_member")).count() == 0


def test_stream_sketch_resumes_from_checkpoint(spark, tmp_path):
    """North-rule resumability on the STREAMING side: a sketch monitor
    stopped and restarted against the same checkpointLocation resumes —
    the file-source log skips already-processed files (run 2 reads ONLY
    the new rows) while the aggregation state carries forward, so the
    final complete-mode sketch equals the batch sketch over everything
    ever streamed."""
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.stats import hll_sketch
    from jsonschema_spark.streaming.validate import stream_hll_sketch

    src = str(tmp_path / "rurls")
    ckpt = str(tmp_path / "ckpt")

    def write(lo, hi):
        spark.range(lo, hi).select(
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("url")
        ).write.mode("append").parquet(src)

    p = 8
    write(0, 2000)
    schema = spark.read.parquet(src).schema

    def run(name):
        sdf = spark.readStream.schema(schema).parquet(src)
        q = (stream_hll_sketch(sdf, "url", p)
             .writeStream.outputMode("complete")
             .option("checkpointLocation", ckpt)
             .format("memory").queryName(name)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return q

    q1 = run("hll_resume_1")
    n1 = sum(pr["numInputRows"] for pr in q1.recentProgress)
    write(2000, 5000)
    q2 = run("hll_resume_2")
    n2 = sum(pr["numInputRows"] for pr in q2.recentProgress)
    # run 2 read ONLY the new file's rows — the checkpoint log resumed
    assert n1 == 2000 and n2 == 3000, (n1, n2)
    got = sorted((r["bucket"], r["max_rank"])
                 for r in spark.table("hll_resume_2").collect())
    want = sorted((r["bucket"], r["max_rank"]) for r in
                  hll_sketch(spark.read.parquet(src), "url", p).collect())
    assert got == want


def test_meta_mojibake_jsonld_stream_equals_batch(spark, tmp_path):
    """The third-session scan-shaped operators (html_meta_df,
    mojibake_stats_df, embedded_jsonld_df → validate) are pure per-row
    projections/generators, so they run UNCHANGED on a streaming
    DataFrame — drained stream == batch. The three legs are re-joined
    per micro-batch via foreachBatch (a page's rows arrive together;
    same documented pattern as the WARC pipeline above)."""
    from jsonschema_spark.operators.htmltext import (
        embedded_jsonld_df, html_meta_df)
    from jsonschema_spark.operators.textstats import mojibake_stats_df
    from jsonschema_spark.operators.validate import validate

    src = str(tmp_path / "pages")
    rows = []
    for i in range(30):
        title = f"<title>Doc {i} cafÃ©</title>" if i % 3 else ""
        robots = ("<meta name='robots' content='noindex'>"
                  if i % 5 == 0 else "")
        block = ('{"@type":"Article","headline":"h%d"}' % i
                 if i % 4 else '{"@type":"Article"')  # malformed on %4==0
        rows.append((
            i,
            f"<html lang=en><head>{title}{robots}"
            f'<script type="application/ld+json">{block}</script>'
            "</head><body>b â€“ body</body></html>",
        ))
    batch = spark.createDataFrame(rows, "doc_id long, html string")
    batch.write.parquet(src)

    def pipeline(df):
        meta = html_meta_df(df, binary=False)
        moji = mojibake_stats_df(df, "doc_id", "html")
        blocks = validate(
            embedded_jsonld_df(df, binary=False),
            {"type": "object", "required": ["@type", "headline"]},
            doc_col="jsonld")
        return (
            meta.select("doc_id", "title", "noindex")
            .join(moji.select("doc_id", "n_chars_fixed"), "doc_id")
            .join(blocks.select("doc_id", "block_idx", "valid"), "doc_id")
        )

    want = sorted(map(tuple, pipeline(batch).collect()))
    assert len(want) == 30
    assert any(not t[-1] for t in want) and any(t[-1] for t in want)
    assert any(t[3] > 0 for t in want)  # mojibake repaired somewhere

    collected = []

    def sink(bdf, _epoch):
        collected.extend(pipeline(bdf).collect())

    sdf = spark.readStream.schema(batch.schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = sdf.writeStream.foreachBatch(sink) \
        .trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert sorted(map(tuple, collected)) == want


def test_stream_mime_census_equals_batch(spark, tmp_path):
    """mime_profile_df is built purely from select + one groupBy-agg, so
    it runs UNCHANGED on a streaming DataFrame (the groupBy becomes the
    stateful streaming agg; state is one row per MIME type — bounded
    forever, no watermark needed). Drained over multiple micro-batches
    it equals the batch census over the union."""
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.multimodal import mime_profile_df

    src = str(tmp_path / "pay")
    for f in range(3):
        spark.range(f * 500, (f + 1) * 500).select(
            F.when(F.col("id") % 3 == 0,
                   F.unhex(F.lit("89504E470D0A1A0A00")))
            .when(F.col("id") % 3 == 1, F.unhex(F.lit("255044462D312E35")))
            .otherwise(F.unhex(F.lpad(F.hex(F.col("id")), 16, "0")))
            .alias("payload")
        ).write.mode("append").parquet(src)
    batch = spark.read.parquet(src)
    want = sorted(map(tuple, mime_profile_df(batch).collect()))
    sdf = (spark.readStream.schema(batch.schema)
           .option("maxFilesPerTrigger", 1).parquet(src))
    q = (mime_profile_df(sdf).writeStream.format("memory")
         .queryName("mime_census_t").outputMode("complete")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(map(tuple,
                     spark.sql("select * from mime_census_t").collect()))
    assert got == want


def test_stream_check_suite_equals_batch(spark, tmp_path):
    """The ALGEBRAIC subset of check_suite (counts, bounds, rates —
    everything except the Expand count-distincts, which streaming
    forbids) runs UNCHANGED on a streaming DataFrame: the one global
    agg becomes the stateful streaming aggregate (bounded state: one
    row), the explode is a stateless projection after it. Drained over
    3 micro-batches the result rows are identical to batch over the
    union — the live table monitor is plain delegation."""
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.checks import check_suite

    src = str(tmp_path / "rows")
    for f in range(3):
        spark.range(f * 5000, (f + 1) * 5000).select(
            F.col("id"),
            F.when(F.col("id") % 11 == 0, None)
            .otherwise((F.col("id") % 5).cast("string")).alias("v"),
            ((F.col("id") % 997) / F.lit(10.0)).alias("x"),
        ).write.mode("append").parquet(src)
    batch = spark.read.parquet(src)

    checks = [
        {"name": "size", "check": "size_min", "min": 10_000},
        {"name": "v_complete", "check": "completeness", "col": "v",
         "min_ppm": 900_000},
        {"name": "v_domain", "check": "contained_ppm", "col": "v",
         "allowed": ["0", "1", "2", "3", "4"], "min_ppm": 1_000_000},
        {"name": "x_min", "check": "min_ge", "col": "x",
         "scale": 10, "ge": 0},
        {"name": "x_max", "check": "max_le", "col": "x",
         "scale": 10, "le": 996},
        {"name": "x_mean", "check": "mean_scaled_between", "col": "x",
         "scale": 10, "lo": 1, "hi": 10_000},
    ]
    want = sorted(map(tuple, check_suite(batch, checks).collect()))

    sdf = (spark.readStream.schema(batch.schema)
           .option("maxFilesPerTrigger", 1).parquet(src))
    q = (check_suite(sdf, checks)
         .writeStream.outputMode("complete")
         .format("memory").queryName("checks_stream")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.table("checks_stream").collect()))
    assert got == want
    assert {r[0] for r in got} == {c["name"] for c in checks}


def test_stream_check_suite_grouped_equals_batch(spark, tmp_path):
    """Grouped check_suite (the per-slice contract) is ONE streaming
    aggregate with n_groups rows of bounded state — the per-language
    live table monitor is plain delegation, like the global form.
    Drained over 3 micro-batches ≡ batch over the union."""
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.checks import check_suite

    src = str(tmp_path / "grows")
    for f in range(3):
        spark.range(f * 4000, (f + 1) * 4000).select(
            F.col("id"),
            (F.col("id") % 3).cast("string").alias("g"),
            F.when(F.col("id") % 7 == 0, None)
            .otherwise((F.col("id") % 13).cast("double")).alias("x"),
        ).write.mode("append").parquet(src)
    batch = spark.read.parquet(src)

    checks = [
        {"name": "size", "check": "size_min", "min": 3000},
        {"name": "x_complete", "check": "completeness", "col": "x",
         "min_ppm": 800_000},
        {"name": "x_mean", "check": "mean_scaled_between", "col": "x",
         "scale": 100, "lo": 1, "hi": 10_000},
        {"name": "x_max", "check": "max_le", "col": "x", "le": 12},
    ]
    want = sorted(map(tuple,
                      check_suite(batch, checks, by=["g"]).collect()))

    sdf = (spark.readStream.schema(batch.schema)
           .option("maxFilesPerTrigger", 1).parquet(src))
    q = (check_suite(sdf, checks, by=["g"])
         .writeStream.outputMode("complete")
         .format("memory").queryName("gchecks_stream")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.table("gchecks_stream").collect()))
    assert got == want
    assert len(got) == 3 * len(checks)
