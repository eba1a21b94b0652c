"""Semantic properties of the training-prep operators — the half the
cross-engine oracle gate can't see (it proves Spark==DuckDB, not that
either computes something sensible)."""

from __future__ import annotations

import pytest

from ocr_endpoint_project_spark.operators import trainprep as tp

SF = "/root/testdata/sf0.001"


def test_split_fractions_and_stability(spark):
    rows = tp.q_train_split_assign(spark, SF).collect()
    n = len(rows)
    frac = {s: sum(1 for r in rows if r.split == s) / n for s in ("test", "val", "train")}
    # hash buckets: 10/10/80 within binomial noise at n=50
    assert 0.0 <= frac["test"] <= 0.30
    assert 0.0 <= frac["val"] <= 0.30
    assert frac["train"] >= 0.55
    # stability: the split is a pure function of doc_id — recompute on a
    # halved corpus and every surviving doc keeps its assignment
    first = {r.doc_id: r.split for r in rows}
    half = (
        tp.q_train_split_assign(spark, SF)
        .where("doc_id % 2 = 0")
        .collect()
    )
    for r in half:
        assert first[r.doc_id] == r.split


def test_pack_sequences_conservation(spark):
    rows = tp.q_train_pack_sequences(spark, SF).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.doc_id)
        # offsets tile the shard's token stream with no gaps or overlaps
        off = 0
        for r in rs:
            assert r.tok_start == off
            assert r.tok_end == off + r.n_tokens
            off = r.tok_end
        # pack ids are consistent with the offsets
        for r in rs:
            if r.n_tokens > 0:
                assert r.pack_first == r.tok_start // tp.PACK_TOKENS
                assert r.pack_last == (r.tok_end - 1) // tp.PACK_TOKENS
                assert r.n_packs_spanned == r.pack_last - r.pack_first + 1
                # n tokens at any offset touch at most floor((n-2)/B)+2 packs
                assert r.n_packs_spanned <= max(r.n_tokens - 2, 0) // tp.PACK_TOKENS + 2
            else:
                assert r.n_packs_spanned == 0


def test_mix_weights_sum_and_direction(spark):
    rows = tp.q_train_mix_weights(spark, SF).collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-2  # r4 per-row rounding
    big = max(rows, key=lambda r: r.n_docs)
    small = min(rows, key=lambda r: r.n_docs)
    if big.n_docs > small.n_docs:
        # temperature flattening: big domains under-sampled, small over-sampled
        assert big.oversample <= 1.0 + 1e-9
        assert small.oversample >= 1.0 - 1e-9


def test_pagerank_floor_and_sources(spark):
    edges = tp._edges(tp._events(spark, SF))
    with_in = {r.dst for r in edges.select("dst").distinct().collect()}
    ranks = {r.host: r.rank_ppm for r in tp.q_web_host_pagerank(spark, SF).collect()}
    for host, r in ranks.items():
        assert r >= 150_000  # damping floor
        if host not in with_in:
            assert r == 150_000  # no in-links -> exactly the floor
    # dangling mass is dropped, so total rank never exceeds the injected total
    assert sum(ranks.values()) <= len(ranks) * 1_000_000
