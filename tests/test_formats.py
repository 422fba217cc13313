"""All 21 `format` validators (SURVEY.md §2.4): positive/negative cases
evaluated in ONE pass (one boolean column per (format, case))."""

from pyspark.sql import functions as F

from jsonschema_spark.functions.formats import FORMATS, format_ok

CASES = {
    "uri": [("https://example.com/a?b=c#d", True), ("ftp://x/y", True),
            ("not a uri", False), ("/relative/only", False), ("http://x/%zz", False)],
    "uri-reference": [("/relative/path", True), ("a b", False)],
    "iri": [("https://example.com/x", True), ("nope nope", False)],
    "iri-reference": [("frag#x", True), ("sp ace", False)],
    "uri-template": [("/users/{id}", True), ("/u{", False)],
    "date-time": [("2021-06-01T12:00:00Z", True), ("2021-06-01t12:00:00+05:30", True),
                  ("2021-13-01T12:00:00Z", False), ("2021-06-01 12:00:00", False)],
    "date": [("2021-02-28", True), ("2021-02-30", False), ("21-02-28", False)],
    "time": [("23:59:60Z", True), ("12:00:00+01:00", True), ("24:00:00Z", False)],
    "partial-time": [("12:34:56", True), ("12:34:56Z", False)],
    "duration": [("P1Y2M3DT4H5M6S", True), ("PT0.5S", True), ("P3W", True),
                 ("P", False), ("P1YT", False)],
    "ipv4": [("192.168.0.1", True), ("255.255.255.255", True),
             ("256.1.1.1", False), ("1.2.3", False)],
    "ipv6": [("2001:db8::1", True), ("::1", True), ("::ffff:192.0.2.1", True),
             ("2001:db8::1::2", False), ("g::1", False)],
    "hostname": [("example-host.co", True), ("a" * 64 + ".com", False), ("-bad.com", False)],
    "idn-hostname": [("example.com", True), ("bad_host", False)],
    "email": [("a.b+c@example.com", True), ("no-at-sign", False), ("a@b@c", False)],
    "idn-email": [("x@example.org", True), ("@missing", False)],
    "uuid": [("123e4567-e89b-12d3-a456-426614174000", True),
             ("123e4567e89b12d3a456426614174000", False)],
    "json-pointer": [("/a/b~0c/0", True), ("", True), ("no-slash", False), ("/bad~2", False)],
    "relative-json-pointer": [("0#", True), ("2/a/b", True), ("01/a", False), ("-1/a", False)],
    "color": [("#abc", True), ("#AABBCC", True), ("orange", True), ("#ab", False), ("magenta", False)],
    "regex": [("^a(b|c)*$", True), ("a{1,2}", True), ("(unclosed", False), ("a)bad", False)],
}


def test_all_formats_one_pass(spark):
    assert set(CASES) == set(FORMATS), "every format spec needs cases"
    flat = [(fmt, i, v, exp) for fmt, pairs in CASES.items() for i, (v, exp) in enumerate(pairs)]
    df = spark.createDataFrame(flat, "fmt string, i int, value string, expected boolean")
    cols = [
        F.when(F.col("fmt") == fmt, format_ok(fmt, F.col("value"))).alias(fmt)
        for fmt in CASES
    ]
    rows = df.select("fmt", "i", "value", "expected", *cols).collect()
    bad = []
    for r in rows:
        got = r[r["fmt"]]
        if bool(got) != r["expected"]:
            bad.append((r["fmt"], r["value"], r["expected"], got))
    assert not bad, f"format mismatches: {bad}"


STRICT_CASES = {
    "idn-hostname": [("bücher.example", True), ("xn--bcher-kva.example", True),
                     ("example.com", True), ("-bad.example", False),
                     ("a" * 64 + ".com", False), ("trailing.dot.", False)],
    "idn-email": [("user@bücher.example", True), ("x@example.org", True),
                  ("no-at-sign", False), ("u@-bad.example", False)],
    "iri": [("https://例え.jp/パス?q=値", True), ("mailto:user@example.com", True),
            ("https://exa mple.com/", False), ("no-scheme-iri", False)],
    "iri-reference": [("/путь/к/файлу", True), ("frag#x", True), ("%2", False)],
}


def test_strict_formats_python():
    from jsonschema_spark.functions.formats import format_py_strict

    bad = [(f, v, e) for f, pairs in STRICT_CASES.items()
           for v, e in pairs if format_py_strict(f, v) != e]
    assert not bad, f"strict format mismatches: {bad}"


def test_strict_formats_spark_path(spark):
    """format_strict=True routes idn-*/iri through the parser-grade pandas
    UDF; a unicode hostname the regex approximation rejects now validates."""
    from jsonschema_spark import compile_schema, validate

    schema = {"properties": {"host": {"format": "idn-hostname"}}}
    df = spark.createDataFrame(
        [("bücher.example",), ("example.com",), ("-bad.example",)], "host string")
    strict = [r["valid"] for r in
              validate(df, compile_schema(schema, format_strict=True)).collect()]
    assert strict == [True, True, False]
    # default (JVM regex) path: ASCII-only approximation rejects the IDN
    loose = [r["valid"] for r in validate(df, compile_schema(schema)).collect()]
    assert loose == [False, True, False]
