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


def test_lf_only_framing_and_warc_11(spark):
    f = ("WARC/1.1\nWARC-Type: response\nWARC-Target-URI: u\n"
         "Content-Length: 4\n\nbody\n\n")
    for exact in (False, True):
        rows = _collect(spark, [(1, f)], exact=exact)
        assert len(rows) == 1 and rows[0]["payload"] == "body"
        assert rows[0]["content_length"] == 4
