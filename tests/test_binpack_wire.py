"""Byte-exact JSON BinPack wire parity (operators/binpack_wire.py).

Goldens reproduce the reference CLI's own encode fixtures byte for
byte — /root/reference/test/encode/pass_schema_less.sh (single
document) and pass_schema_less_jsonl.sh (JSONL through one encoder,
shared-key back-references across rows) — plus decoder round-trips,
the stderr report lines, and a hypothesis net over arbitrary JSON.
"""
import json
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from jsonschema_spark.operators.binpack_wire import (
    decode_values,
    encode_report,
    encode_values,
    real_digits,
)


def test_golden_schema_less_single_document():
    # pass_schema_less.sh: { "version": 2.0 } -> 11 bytes
    doc = json.loads('{ "version": 2.0 }')
    got = encode_values([doc])
    assert got.hex() == "130876657273696f6e3702"
    assert decode_values(got) == [{"version": 2.0}]
    assert isinstance(decode_values(got)[0]["version"], float)
    # the CLI's stderr summary: original 19 bytes (file incl. newline)
    assert encode_report(19, len(got)) == (
        "original file size: 19 bytes\n"
        "encoded file size: 11 bytes\n"
        "compression ratio: 57%\n")


def test_golden_schema_less_jsonl_shared_keys():
    # pass_schema_less_jsonl.sh: five { "count": N } rows through ONE
    # encoder; rows 2-5 back-reference the shared "count" key
    docs = [{"count": n} for n in range(1, 6)]
    got = encode_values(docs)
    assert got.hex() == (
        "1306636f756e74151300091d13000525130005" + "2d13000535")
    assert decode_values(got) == docs
    assert encode_report(75, len(got)) == (
        "original file size: 75 bytes\n"
        "encoded file size: 24 bytes\n"
        "compression ratio: 32%\n")


def test_integer_encodings_all_ranges():
    cases = [0, 1, 30, 31, 255, 256, 2**40,
             -1, -31, -32, -256, -257, -(2**40)]
    blob = encode_values([cases])
    assert decode_values(blob) == [cases]
    # spot-check the single-byte embeddings
    assert encode_values([0]).hex() == "0d"        # 101 | 1<<3
    assert encode_values([1]).hex() == "15"        # 101 | 2<<3
    assert encode_values([-1]).hex() == "0e"       # 110 | 1<<3 (abs-1=0)
    assert encode_values([31]).hex() == "051f"     # type byte + 31
    assert encode_values([256]).hex() == "1f8002"  # OTHER|POS_INT<<3, varint


def test_real_encodings():
    # integral reals 0..255 pack as one byte after the tag
    assert encode_values([2.0]).hex() == "3702"
    assert encode_values([255.0]).hex() == "37ff"
    # integral real out of byte range -> DOUBLE_VARINT_TUPLE
    assert decode_values(encode_values([256.0])) == [256.0]
    assert decode_values(encode_values([-3.0])) == [-3.0]
    # fractional: digits/point decomposition survives exactly
    for v in (0.1, 3.14, -2.5, 1234.5678, 0.001):
        assert decode_values(encode_values([v])) == [v]
    assert real_digits(2.0) == (2, 0)
    assert real_digits(0.1) == (1, 1)
    assert real_digits(3.14) == (314, 2)


def test_string_encodings_by_length_and_sharing():
    for n in (0, 1, 30, 31, 61, 62, 100, 127, 128, 300, 1024, 5000):
        s = "x" * n
        assert decode_values(encode_values([s])) == [s]
    # same standalone string twice -> second is a back-reference
    twice = encode_values([["hello-world", "hello-world"]])
    once = encode_values([["hello-world", "different-str"]])
    assert len(twice) < len(once)
    assert decode_values(twice) == [["hello-world", "hello-world"]]
    # long shared string in [62,128): the FLOOR marker-0 back-reference
    # form (that branch records into the cache)
    long_s = "y" * 100
    blob = encode_values([[long_s, long_s]])
    assert decode_values(blob) == [[long_s, long_s]]
    assert len(blob) < 2 * 100
    # >=128 chars: the reference's exponent branch does NOT cache
    # (encoder_any.cc:144-152 has no record call), so a repeat encodes
    # in full — mirrored faithfully, round-trip still exact
    very_long = "z" * 200
    blob2 = encode_values([[very_long, very_long]])
    assert decode_values(blob2) == [[very_long, very_long]]
    assert len(blob2) > 2 * 200
    # strings under 3 bytes never enter the cache (cache.cc minimum)
    tiny = encode_values([["ab", "ab"]])
    assert decode_values(tiny) == [["ab", "ab"]]


def test_nested_and_large_containers():
    doc = {
        "a": [1, "two", 3.5, None, True, False, {"k": "v"}],
        "big": list(range(40)),            # >= 31 elements
        "obj": {f"key{i}": i for i in range(35)},  # >= 31 members
        "unicode": "héllo wörld ünïcode",
    }
    blob = encode_values([doc])
    assert decode_values(blob) == [doc]


def test_shared_keys_across_documents_and_utf8():
    docs = [{"päge": i, "url": f"https://x/{i}"} for i in range(10)]
    blob = encode_values(docs)
    assert decode_values(blob) == docs


# decimal-representable doubles: DOUBLE_VARINT_TUPLE stores base-10
# digits in an int64, so extreme binary floats (subnormals, 300+ digit
# expansions) are outside the REFERENCE format's fidelity too — the
# C++ encoder would overflow the same way. Generate m·10^-e instead.
_decimal_floats = st.builds(
    lambda m, e: m / (10 ** e),
    st.integers(min_value=-(10**12), max_value=10**12),
    st.integers(min_value=0, max_value=6),
)

_json = st.recursive(
    st.none() | st.booleans()
    | st.integers(min_value=-(2**62), max_value=2**62)
    | _decimal_floats
    | st.text(max_size=40),
    lambda children: st.lists(children, max_size=6)
    | st.dictionaries(st.text(max_size=12), children, max_size=6),
    max_leaves=25,
)


@settings(max_examples=150, deadline=None)
@given(st.lists(_json, max_size=4))
def test_roundtrip_hypothesis(docs):
    decoded = decode_values(encode_values(docs))
    assert len(decoded) == len(docs)
    for got, want in zip(decoded, docs):
        assert _equiv(got, want), (got, want)


def test_golden_decode_rendering():
    """test/decode/pass_schema_less.sh: decode renders through the
    reference prettifier — integral reals print as '2.0' (stringify.h
    fixed-digits+'.0' rule), 2-space indent, trailing newline."""
    from jsonschema_spark.operators.testrunner import prettify_json

    blob = encode_values([json.loads('{ "version": 2.0 }')])
    [doc] = decode_values(blob)
    assert prettify_json(doc) + "\n" == '{\n  "version": 2.0\n}\n'
    # the full real-rendering rule set
    assert prettify_json(0.0) == "0.0"
    assert prettify_json(-0.0) == "-0.0"
    assert prettify_json(-3.0) == "-3.0"
    assert prettify_json(0.1) == "0.1"
    assert prettify_json(1e25) == "10000000000000000000000000.0"
    assert prettify_json(1.5e-5) == "1.5e-05"


def test_spark_reference_wire_roundtrip(spark):
    """wire='reference' on the DataFrame surface: per-row byte-exact
    CLI encoding, decode restores the canonical JSON."""
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.binpack import decode_df, encode_df

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(50)
    j = docs.select(
        "doc_id",
        F.to_json(F.struct("doc_id", "lang", "n_chars")).alias("doc"))
    enc = encode_df(j, "doc", wire="reference")
    out = decode_df(enc, "bin", wire="reference", out_col="back")
    rows = out.select("doc_id", "doc", "back", "bin").collect()
    assert len(rows) == 50
    for r in rows:
        assert json.loads(r["back"]) == json.loads(r["doc"])
    # single-cell bytes match the driver-side encoder exactly
    from jsonschema_spark.operators.binpack_wire import encode_values
    r0 = rows[0]
    assert bytes(r0["bin"]) == encode_values([json.loads(r0["doc"])])


def _equiv(got, want):
    """Round-trip equality modulo the format's documented numeric
    identifications: an integral float in [0,255] decodes as float
    (exact value preserved); everything else type-exact."""
    if isinstance(want, bool) or isinstance(got, bool):
        return got is want
    if isinstance(want, float):
        # DOUBLE_VARINT_TUPLE snaps digits with an ABSOLUTE 1e-9
        # threshold (numeric_util.h correct_ieee754), so doubles whose
        # magnitude's ULP exceeds it round-trip only to ~1e-9 relative
        # — in the C++ reference exactly as here. Clean decimal
        # literals round-trip exactly (pinned in test_real_encodings).
        return isinstance(got, (int, float)) and (
            float(got) == want
            or math.isclose(float(got), want, rel_tol=1e-9))
    if isinstance(want, int):
        return isinstance(got, int) and got == want
    if isinstance(want, list):
        return (isinstance(got, list) and len(got) == len(want)
                and all(_equiv(g, w) for g, w in zip(got, want)))
    if isinstance(want, dict):
        return (isinstance(got, dict) and got.keys() == want.keys()
                and all(_equiv(got[k], want[k]) for k in want))
    return got == want
