"""WARC record extraction (sources/warc.py) — both parse paths."""
from jsonschema_spark.sources.warc import warc_records


def _rec(uri, body, typ="response", cl=True):
    h = f"WARC/1.0\r\nWARC-Type: {typ}\r\nWARC-Target-URI: {uri}\r\n"
    h += "WARC-Date: 2024-01-01T00:00:00Z\r\n"
    if cl:
        h += f"Content-Length: {len(body)}\r\n"
    return h + "\r\n" + body + "\r\n\r\n"


def _collect(spark, files, exact):
    df = spark.createDataFrame(files, ["file_id", "warc"])
    return [
        r.asDict()
        for r in warc_records(df, exact=exact).orderBy("file_id", "rec_idx").collect()
    ]


def test_paths_agree_on_well_formed_files(spark):
    f1 = (_rec("https://a.org/1", "<html>one</html>")
          + _rec("https://a.org/2", "two body with trailing spaces   ")
          + _rec("https://a.org/3", "", typ="request"))
    f2 = "leading garbage\r\n" + _rec("https://b.org/x", "bbb")
    jvm = _collect(spark, [(1, f1), (2, f2)], exact=False)
    ex = _collect(spark, [(1, f1), (2, f2)], exact=True)
    assert jvm == ex
    assert [r["target_uri"] for r in jvm] == [
        "https://a.org/1", "https://a.org/2", "https://a.org/3",
        "https://b.org/x",
    ]
    assert jvm[0]["payload"] == "<html>one</html>"
    assert jvm[1]["payload"].endswith("   ")  # CL slice keeps exact bytes
    assert jvm[2]["payload"] == "" and jvm[2]["warc_type"] == "request"
    assert [r["rec_idx"] for r in jvm] == [0, 1, 2, 0]  # garbage slot skipped


def test_missing_headers_are_null_not_errors(spark):
    f = "WARC/1.0\r\nWARC-Type: warcinfo\r\n\r\nfree-form info\r\n\r\n"
    for exact in (False, True):
        rows = _collect(spark, [(1, f)], exact=exact)
        assert len(rows) == 1
        r = rows[0]
        assert r["warc_type"] == "warcinfo"
        assert r["target_uri"] is None and r["content_length"] is None
        assert r["payload"] == "free-form info"


def test_delimiter_in_payload_needs_exact_path(spark):
    """A payload containing a WARC version line: the Content-Length path
    parses ONE correct record; the JVM split path documents its hazard by
    splitting early."""
    evil = "contains\nWARC/1.0\r\nfake: line"
    f = _rec("https://b.org/x", evil)
    ex = _collect(spark, [(1, f)], exact=True)
    assert len(ex) == 1 and ex[0]["payload"] == evil
    jvm = _collect(spark, [(1, f)], exact=False)
    assert len(jvm) == 2  # the documented delimiter-in-payload hazard
    assert jvm[0]["payload"] == "contains"


def test_malformed_content_length_never_kills_the_scan(spark):
    """ANSI mode: a non-numeric or overflowing Content-Length must yield
    NULL content_length + delimiter-framed payload, not a task-killing
    CAST_INVALID_INPUT / overflow (ADVICE r3, warc.py JVM path)."""
    bad_cl = ("WARC/1.0\r\nWARC-Type: response\r\n"
              "WARC-Target-URI: https://m.org/a\r\nContent-Length: abc\r\n"
              "\r\npayload-a\r\n\r\n")
    huge_cl = ("WARC/1.0\r\nWARC-Type: response\r\n"
               "WARC-Target-URI: https://m.org/b\r\n"
               "Content-Length: 99999999999999999999\r\n"  # > int64
               "\r\npayload-b\r\n\r\n")
    big32 = ("WARC/1.0\r\nWARC-Type: response\r\n"
             "WARC-Target-URI: https://m.org/c\r\nContent-Length: 4294967296\r\n"
             "\r\npayload-c\r\n\r\n")  # > int32 but valid long
    f = bad_cl + huge_cl + big32
    for exact in (False, True):
        rows = _collect(spark, [(1, f)], exact=exact)
        assert len(rows) == 3, f"exact={exact}"
        assert rows[0]["content_length"] is None
        assert rows[0]["payload"] == "payload-a"
        assert rows[1]["content_length"] is None or exact  # >int64: JVM NULL
        assert rows[1]["payload"].startswith("payload-b")
        assert rows[2]["content_length"] == 4294967296
        # declared length exceeds the actual payload: slice = whole rest
        assert rows[2]["payload"].startswith("payload-c")


def test_exact_path_slices_bytes_not_chars(spark):
    """Content-Length is a BYTE count: a non-ASCII payload must not
    over-read and desync the following record (ADVICE r3, exact path)."""
    body1 = "héllo wörld — ünïcode"  # 21 chars, more bytes
    nbytes = len(body1.encode("utf-8"))
    assert nbytes > len(body1)
    f = (f"WARC/1.0\r\nWARC-Type: response\r\n"
         f"WARC-Target-URI: https://u.org/1\r\nContent-Length: {nbytes}\r\n"
         f"\r\n{body1}\r\n\r\n"
         + _rec("https://u.org/2", "plain second record"))
    rows = _collect(spark, [(1, f)], exact=True)
    assert len(rows) == 2
    assert rows[0]["payload"] == body1
    assert rows[0]["content_length"] == nbytes
    assert rows[1]["target_uri"] == "https://u.org/2"
    assert rows[1]["payload"] == "plain second record"


def test_lf_only_framing_and_warc_11(spark):
    f = ("WARC/1.1\nWARC-Type: response\nWARC-Target-URI: u\n"
         "Content-Length: 4\n\nbody\n\n")
    for exact in (False, True):
        rows = _collect(spark, [(1, f)], exact=exact)
        assert len(rows) == 1 and rows[0]["payload"] == "body"
        assert rows[0]["content_length"] == 4


# --- WET serialization (write side) ----------------------------------------


def test_wet_roundtrip_bytes_exact(spark):
    from pyspark.sql import functions as F

    from jsonschema_spark.sources.warc import warc_records, wet_serialize_df

    df = spark.createDataFrame(
        [(0, "https://a.org/x", "plain text"),
         (1, "https://b.org/y", "café — naïve ünïcode"),
         (2, "https://c.org/z", None),
         (3, "https://d.org/w", "line1\nline2\r\nline3")],
        "doc_id long, uri string, text string")
    wet = wet_serialize_df(df, "doc_id", "uri", "text")
    got = {r["doc_id"]: r for r in wet.collect()}
    assert got[1]["n_payload_bytes"] == len(
        "café — naïve ünïcode".encode())  # bytes, not chars
    assert got[2]["n_payload_bytes"] == 0
    back = {r["file_id"]: r for r in warc_records(
        wet.select(F.col("doc_id").alias("file_id"),
                   F.col("wet").alias("warc")), exact=True).collect()}
    for i, (_, uri, text) in enumerate(
            [tuple(r) for r in df.orderBy("doc_id").collect()]):
        assert back[i]["warc_type"] == "conversion"
        assert back[i]["target_uri"] == uri
        assert back[i]["payload"] == (text or "")
        assert back[i]["content_length"] == len((text or "").encode())


def test_wet_sharded_file_parses_as_multirecord(spark):
    """Concatenating per-page records (the shard_assign grouping) yields
    a valid multi-record WET file for BOTH parser paths."""
    from pyspark.sql import functions as F

    from jsonschema_spark.sources.warc import warc_records, wet_serialize_df

    df = spark.createDataFrame(
        [(i, f"https://h.org/p{i}", f"text {i} body") for i in range(6)],
        "doc_id long, uri string, text string")
    wet = wet_serialize_df(df, "doc_id", "uri", "text")
    one = wet.groupBy((F.col("doc_id") % 2).alias("file_id")).agg(
        F.concat_ws("", F.array_sort(F.collect_list(
            F.struct("doc_id", "wet"))).getField("wet")).alias("warc"))
    for exact in (False, True):
        recs = warc_records(one, exact=exact).collect()
        assert len(recs) == 6
        assert sorted(r["payload"] for r in recs) == sorted(
            f"text {i} body" for i in range(6))


def test_wet_date_header(spark):
    from pyspark.sql import functions as F

    from jsonschema_spark.sources.warc import warc_records, wet_serialize_df

    df = spark.createDataFrame(
        [(0, "https://a.org", "t", "2026-08-19T00:00:00Z")],
        "doc_id long, uri string, text string, dt string")
    wet = wet_serialize_df(df, "doc_id", "uri", "text", date_col="dt")
    r = warc_records(wet.select(F.col("doc_id").alias("file_id"),
                                F.col("wet").alias("warc")),
                     exact=True).collect()[0]
    assert r["warc_date"] == "2026-08-19T00:00:00Z"
