"""Guards on the driver contract: entry() smoke + the full oracle gate
(every queries() entry vs its DuckDB oracle) at sf0.001."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from tools.check_oracles import check  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"url", "status", "byte_identical"} <= cols
    assert all(r["byte_identical"] for r in rows)
    assert all(r["status"] == "succeeded" for r in rows)


def test_queries_have_oracles_or_documented_gap(spark):
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert len(q) >= 30
    assert set(o) <= set(q)
    # every query is oracle-checked (token-level WER got an exact SQL
    # oracle in r2 via the token->single-byte-codepoint levenshtein trick)
    rows_only = set(q) - set(o)
    assert rows_only == set()


def test_all_oracles_match(spark):
    failed = check([], sf_dir=SF_SMALL, spark=spark)
    assert not failed, f"oracle mismatches: {failed}"
