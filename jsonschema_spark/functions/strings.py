"""String helpers: regex fast-path classification and code-point lengths.

The reference classifies compiled regexes into Prefix / NonEmpty / Range /
general-PCRE2 variants so common patterns skip the regex engine entirely
(/root/reference/vendor/core/src/core/regex/include/sourcemeta/core/regex.h:31-69).
We reproduce the same strategy: `^literal` → `startswith` (stays in codegen
with no regex state machine), `.+`-likes → `length >= 1`, `^.{a,b}$` →
`length between`, everything else → `rlike` (unanchored search, matching
ECMA `test()` semantics).

String lengths are Unicode code points, not bytes, matching
`JSON::size(String)` (/root/reference/vendor/core/src/core/json/json_value.cc:509-524).
Spark's `length` on StringType already counts code points; the trap the
survey flags (byte-length in Arrow UDFs) is avoided by keeping length checks
JVM-side.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, functions as F

_META = set(".^$*+?()[]{}|\\")


@dataclass(frozen=True)
class RegexPlan:
    kind: str  # 'prefix' | 'nonempty' | 'range' | 'general'
    prefix: str | None = None
    lo: int | None = None
    hi: int | None = None


def classify_pattern(pattern: str) -> RegexPlan:
    if pattern in (".*", "^.*$", "", "^", "$"):
        return RegexPlan("range", lo=0, hi=None)
    if pattern in (".+", "^.+$", "^.+", ".+$"):
        return RegexPlan("nonempty")
    m = re.fullmatch(r"\^\.\{(\d+)(?:,(\d+))?\}\$", pattern)
    if m:
        lo = int(m.group(1))
        hi = int(m.group(2)) if m.group(2) else lo
        return RegexPlan("range", lo=lo, hi=hi)
    if pattern.startswith("^"):
        body = pattern[1:]
        if body.endswith(".*"):
            body = body[:-2]
        if body and not any(ch in _META for ch in body):
            return RegexPlan("prefix", prefix=body)
    return RegexPlan("general")


# Constructs where Java's regex dialect diverges from the reference's
# permissive ECMA-262 + PCRE2 (regex.h:74-97): empty classes ([] never
# matches, [^] matches everything — both Java compile ERRORS), dangling
# braces (ECMA literal, Java error), control escapes \cX, and anything
# Python `re` itself rejects (likely dialect-sensitive). These route to
# the Python `regex` module (PCRE-compatible superset) in an Arrow pudf —
# the residual-routing path SURVEY §7 calls for.
_RISKY_RE = re.compile(r"\[\^?\]|\\c[A-Za-z]")
_QUANT_RE = re.compile(r"\{\d+(,\d*)?\}")


def _java_dialect_safe(pattern: str) -> bool:
    if _RISKY_RE.search(pattern):
        return False
    # a '{' that does not open a valid quantifier and is not escaped is an
    # ECMA literal but a Java syntax hazard
    for m in re.finditer(r"(?<!\\)\{", pattern):
        if not _QUANT_RE.match(pattern, m.start()):
            return False
    try:
        re.compile(pattern)
    except re.error:
        return False
    return True


def _pcre_fallback(col: Column, pattern: str) -> Column:
    """Residual route: unanchored search with the Python `regex` module
    (PCRE2-compatible — the closest dialect to the reference's engine)."""
    from pyspark.sql.types import BooleanType

    # ECMA idioms PCRE rejects, translated to equivalents: [^] = any char
    # (incl. newline), [] = never matches
    translated = pattern.replace("[^]", r"[\s\S]").replace("[]", r"(?!\s)(?=\s)")

    @F.pandas_udf(BooleanType())
    def probe(s: pd.Series) -> pd.Series:
        try:
            import regex as _re_mod
        except ImportError:  # pragma: no cover
            import re as _re_mod
        try:
            rx = _re_mod.compile(translated)
        except Exception:
            return pd.Series([False] * len(s))
        return s.map(lambda v: None if v is None else bool(rx.search(v)))

    return probe(col)


def pattern_ok(col: Column, pattern: str) -> Column:
    """Boolean Column: `col` matches `pattern` (unanchored search).

    Classification ladder (regex.h:31-69 analogue): prefix/nonempty/range
    fast paths stay in codegen; general Java-safe patterns use `rlike`;
    dialect-risky residuals route to a PCRE pudf."""
    plan = classify_pattern(pattern)
    if plan.kind == "prefix":
        return col.startswith(plan.prefix)
    if plan.kind == "nonempty":
        return F.length(col) >= 1
    if plan.kind == "range":
        if plan.hi is None:
            return col.isNotNull()
        return F.length(col).between(plan.lo, plan.hi)
    if _java_dialect_safe(pattern):
        return col.rlike(pattern)
    return _pcre_fallback(col, pattern)


def pattern_duckdb(col_sql: str, pattern: str) -> str:
    """The same predicate in DuckDB SQL (for oracle queries)."""
    plan = classify_pattern(pattern)
    if plan.kind == "prefix":
        esc = plan.prefix.replace("'", "''").replace("%", "\\%").replace("_", "\\_")
        return f"({col_sql} LIKE '{esc}%' ESCAPE '\\')"
    if plan.kind == "nonempty":
        return f"(length({col_sql}) >= 1)"
    if plan.kind == "range":
        if plan.hi is None:
            return f"({col_sql} IS NOT NULL)"
        return f"(length({col_sql}) BETWEEN {plan.lo} AND {plan.hi})"
    return f"regexp_matches({col_sql}, '{pattern.replace(chr(39), chr(39)*2)}')"
