"""Robots policy + frontier scheduling semantics."""

from __future__ import annotations

from ocr_endpoint_project_spark.operators.webcrawl import (
    _PRIVATE_MOD,
    q_web_robots_frontier,
)

SF = "/root/testdata/sf0.001"


def test_robots_frontier_policy_and_schedule(spark):
    rows = q_web_robots_frontier(spark, SF).collect()
    by_host = {}
    for r in rows:
        # the parsed policy is exactly the synthesized one
        assert (r.doc_id % _PRIVATE_MOD == 0) == (not r.allowed)
        assert 1 <= r.crawl_delay_s <= 5
        if not r.allowed:
            assert r.fetch_slot_s is None
        by_host.setdefault(r.host, []).append(r)
    for host, rs in by_host.items():
        # one delay per host; allowed slots are 0, d, 2d, ... (no holes
        # from denied urls)
        assert len({r.crawl_delay_s for r in rs}) == 1
        d = rs[0].crawl_delay_s
        slots = sorted(r.fetch_slot_s for r in rs if r.allowed)
        assert slots == [i * d for i in range(len(slots))]
