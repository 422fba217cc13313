"""Driver-gate emulation inside pytest: run `__spark_entry__.queries()`
entries and compare against `oracle_sql()` through DuckDB with the exact
normalization the driver applies (sorted columns, stringified cells,
order-insensitive rows) — the same compare as scripts/check_oracle.py.

The suite runs a representative FAST subset (one query per operator
family, ~1 min total) so the oracle path itself is regression-tested;
set ORACLE_PARITY_ALL=1 to sweep every query (what
`python scripts/check_oracle.py` does standalone).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from scripts.check_oracle import TABLES, norm_rows  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

FAST_SUBSET = [
    "validate_docs_counts",      # flat validation
    "validate_events_payload",   # VARIANT tree path
    "dedup_exact_counts",        # dedup family
    "langid",                    # text analysis
    "url_normalize",             # url toolset
    "sessionize_events",         # session windows
    "readability",               # scan-projection signals
    "mixture_sample",            # curation sampling
    "leakage_safe_split",        # group-keyed split
    "ann_topk",                  # embeddings
]


def _names():
    if os.environ.get("ORACLE_PARITY_ALL"):
        return sorted(entrymod.queries())
    return FAST_SUBSET


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, duck, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, SF_DIR)
    sc, sr = norm_rows(list(sdf.columns), [tuple(r) for r in sdf.collect()])
    if name not in oracles:
        assert len(sr) >= 0  # rows-only by documented design
        return
    cur = duck.execute(oracles[name])
    dc, dr = norm_rows([c[0] for c in cur.description], cur.fetchall())
    assert sc == dc
    assert sr == dr
