"""Regex dialect divergence corpus (round-2 verdict directive #4).

The reference compiles `pattern` with PCRE2 under
PCRE2_UTF | PCRE2_UCP | PCRE2_DOTALL | PCRE2_DOLLAR_ENDONLY |
PCRE2_NEVER_BACKSLASH_C | PCRE2_ALLOW_EMPTY_CLASS
(/root/reference/vendor/core/src/core/regex/regex.cc:45-47). Java's
`rlike` dialect silently diverges from those flags in at least five ways:
`.` vs line terminators (DOTALL), `$` before a trailing newline
(DOLLAR_ENDONLY), ASCII-default \\d/\\w/\\s/\\b (UCP), in-class `[`
(Java nested-union vs PCRE2 literal) and in-class `&&` (Java intersection
vs PCRE2 literal). This suite is the committed evidence that the engine's
routing + translation (functions/strings.py:_translate_permissive) draws
the boundary correctly:

1. a hand-derived corpus pins the PERMISSIVE-dialect expected verdicts
   (each case annotated with the flag it exercises);
2. the engine (pattern_ok through a real Spark plan — fast paths, the
   translated Java route, and the pudf fallback alike) must reproduce
   every corpus verdict;
3. a generated pattern grammar (anchors × atoms × quantifiers) is swept
   against the driver-side permissive evaluator (permissive_search_py) —
   any silent Java-dialect divergence that routing fails to translate or
   deflect shows up as a mismatch here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.functions.strings import (
    classify_pattern,
    pattern_ok,
    permissive_search_py,
)

# (pattern, input, expected-under-permissive-PCRE2, which flag/divergence)
CORPUS = [
    # DOTALL: `.` matches every char including line terminators
    ("a.b", "a\nb", True, "DOTALL"),
    ("a.b", "a b", True, "DOTALL"),
    ("a.b", "ab", True, "DOTALL"),
    ("a.b", "axb", True, "DOTALL-plain"),
    ("a.b", "ab", False, "DOTALL-plain"),
    # DOLLAR_ENDONLY: `$` matches at the very end only — NOT before a
    # trailing newline (Java's raw `$` would say True on "a\n")
    ("a$", "a", True, "DOLLAR_ENDONLY"),
    ("a$", "a\n", False, "DOLLAR_ENDONLY"),
    ("a$", "ba", True, "DOLLAR_ENDONLY-search"),
    (r"a\$", "a$b", True, "escaped-dollar-literal"),
    (r"a\$", "a", False, "escaped-dollar-literal"),
    ("[$]", "$", True, "dollar-in-class-literal"),
    # UCP: \d/\w/\s are Unicode (Java raw would say False on all three)
    (r"x\d", "x٣", True, "UCP-d"),
    (r"x\d", "x3", True, "UCP-d"),
    (r"x\d", "xa", False, "UCP-d"),
    (r"x\w", "xé", True, "UCP-w"),
    (r"x\s", "x ", True, "UCP-s"),
    (r"x\S", "x ", False, "UCP-S"),
    (r"[\d]y", "٥y", True, "UCP-d-in-class"),
    # ALLOW_EMPTY_CLASS: [] never matches, [^] matches anything
    ("a[]b", "ab", False, "ALLOW_EMPTY_CLASS"),
    ("[]", "anything", False, "ALLOW_EMPTY_CLASS"),
    ("a[^]b", "a\nb", True, "ALLOW_EMPTY_CLASS"),
    ("[^]", "x", True, "ALLOW_EMPTY_CLASS"),
    # in-class `[` is a LITERAL in PCRE2; Java would parse a nested union
    ("x[[]y", "x[y", True, "class-open-bracket"),
    ("x[a[]y", "x[y", True, "class-open-bracket"),
    ("x[a[]y", "xay", True, "class-open-bracket"),
    # in-class `&&` is LITERAL in PCRE2; Java would intersect (empty → never)
    ("[a&&b]", "&", True, "class-ampersand"),
    ("[a&&b]", "a", True, "class-ampersand"),
    ("[a&&b]", "c", False, "class-ampersand"),
    # dangling brace is a PCRE2 literal; Java alone would fail to compile
    ("a{", "a{", True, "dangling-brace"),
    ("a{2", "a{2", True, "dangling-brace"),
    ("a}", "a}", True, "dangling-close-brace"),
    # PCRE2 extensions Java shares: possessive / atomic groups
    ("a*+b", "aaab", True, "possessive"),
    ("(?>a+)b", "aaab", True, "atomic"),
    # inline flags (PCRE2-style) — route wherever, semantics must hold
    ("(?i)abc", "xABCy", True, "inline-i"),
    ("(?i)abc", "xyz", False, "inline-i"),
    # multiline flag turns DOLLAR_ENDONLY off — $ matches at line ends
    ("(?m)^b$", "a\nb\nc", True, "inline-m"),
    # lookarounds
    ("(?<=ab)c", "xabc", True, "lookbehind"),
    ("(?<=ab)c", "xac", False, "lookbehind"),
    ("a(?!b)", "ac", True, "neg-lookahead"),
    ("a(?!b)", "ab", False, "neg-lookahead"),
    # fast paths stay exactly correct under DOTALL + DOLLAR_ENDONLY
    ("^foo", "foobar", True, "prefix-fast-path"),
    ("^foo", "xfoo", False, "prefix-fast-path"),
    (".+", "\n", True, "nonempty-fast-path-DOTALL"),
    (".+", "", False, "nonempty-fast-path"),
    ("^.{2}$", "😀😀", True, "range-fast-path-codepoints"),
    ("^.{2}$", "a\n", True, "range-fast-path-DOTALL"),
    ("^.{2}$", "abc", False, "range-fast-path"),
    # anchored general patterns: ^...$ becomes ^...\z on the Java route
    ("^src[0-9]$", "src1", True, "anchored-class"),
    ("^src[0-9]$", "src1\n", False, "anchored-class-DOLLAR_ENDONLY"),
    # \b under UCP is a Unicode word boundary
    (r"\bfoo\b", "a foo b", True, "UCP-b"),
    (r"\bfoo\b", "afoo", False, "UCP-b"),
    (r"é\b", "é!", True, "UCP-b-unicode"),
    # unicode escapes
    (r"éx", "éx", True, "unicode-escape"),
]


def test_corpus_against_driver_evaluator():
    """permissive_search_py IS the semantics oracle — pin it first."""
    for pattern, value, expected, tag in CORPUS:
        got = permissive_search_py(pattern, value)
        assert got is expected, f"{tag}: {pattern!r} on {value!r}: {got} != {expected}"


def test_corpus_through_spark_engine(spark):
    """Every corpus verdict must survive the real engine route —
    fast path, translated rlike, or pudf fallback — in ONE Spark job."""
    values = sorted({v for _, v, _, _ in CORPUS})
    df = spark.createDataFrame([(v,) for v in values], "s string")
    pats = sorted({p for p, _, _, _ in CORPUS})
    cols = [pattern_ok(F.col("s"), p).alias(f"p{i}") for i, p in enumerate(pats)]
    rows = {r["s"]: r for r in df.select(F.col("s"), *cols).collect()}
    pidx = {p: i for i, p in enumerate(pats)}
    for pattern, value, expected, tag in CORPUS:
        got = rows[value][f"p{pidx[pattern]}"]
        assert got is expected, (
            f"{tag}: engine said {got} for {pattern!r} on {value!r}, "
            f"permissive dialect says {expected}")


# -- generated divergence sweep ------------------------------------------------

_PREFIXES = ["", "^"]
_ATOMS = ["a", ".", r"\d", r"\w", r"\s", "[ab]", "[a-z]", r"[\w-]", "(ab)",
          "a|b.", r"\S"]
_QUANTS = ["", "*", "+", "{1,2}", "?"]
_SUFFIXES = ["", "$", "b"]

_INPUTS = ["", "a", "ab", "aab", "b", "a\n", "a\nb", "\n", "٣", "é",
           " ", "a-b", "A", "ab\n", "x[y", "&", "😀", "a b"]


def _grammar_patterns():
    out = []
    for pre in _PREFIXES:
        for atom in _ATOMS:
            for q in _QUANTS:
                if q and atom in ("a|b.",):  # quantified alternation nonsense
                    continue
                for suf in _SUFFIXES:
                    out.append(f"{pre}{atom}{q}{suf}")
    return sorted(set(out))


def test_generated_sweep_engine_matches_permissive(spark):
    """Sweep the pattern grammar: engine verdicts == permissive dialect on
    every (pattern, input) pair. A wrongly-routed Java-dialect divergence
    (ASCII classes, $-before-newline, non-DOTALL dot) fails here."""
    pats = _grammar_patterns()
    df = spark.createDataFrame([(v,) for v in _INPUTS], "s string")
    # batches of 80 columns keep each generated projection reasonable
    results = {}
    for lo in range(0, len(pats), 80):
        chunk = pats[lo:lo + 80]
        cols = [pattern_ok(F.col("s"), p).alias(f"p{i}") for i, p in enumerate(chunk)]
        for r in df.select(F.col("s"), *cols).collect():
            for i, p in enumerate(chunk):
                results[(p, r["s"])] = r[f"p{i}"]
    bad = []
    for p in pats:
        for v in _INPUTS:
            want = permissive_search_py(p, v)
            got = results[(p, v)]
            if got is not want:
                bad.append((p, v, got, want))
    assert not bad, f"{len(bad)} divergences, first 10: {bad[:10]}"


def test_duckdb_oracle_translation_matches():
    """The RE2 oracle translation agrees with the permissive dialect on the
    corpus (skipping \\b/\\B patterns, which pattern_duckdb refuses)."""
    duckdb = pytest.importorskip("duckdb")
    from jsonschema_spark.functions.strings import pattern_duckdb

    con = duckdb.connect()
    for pattern, value, expected, tag in CORPUS:
        if "\\b" in pattern or "\\B" in pattern or classify_pattern(pattern).kind != "general":
            continue
        try:
            sql = pattern_duckdb("s", pattern)
        except ValueError:
            continue
        got = con.execute(f"SELECT {sql} FROM (SELECT ? AS s)", [value]).fetchone()[0]
        assert got is expected, f"{tag}: duckdb {sql} on {value!r}: {got} != {expected}"


def test_pattern_duckdb_refuses_ucp_word_boundary():
    from jsonschema_spark.functions.strings import pattern_duckdb

    with pytest.raises(ValueError):
        pattern_duckdb("s", r"\bfoo\b")
