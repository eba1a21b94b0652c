"""Incremental streaming dedup: per-batch MinHash signatures against a
persistent signature state table must reproduce the batch dedup's keeper
set when batches arrive in doc_id order, drop cross-batch duplicates,
and stay idempotent under replay."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_endpoint_project_spark.streaming import stream_dedupe

pytestmark = pytest.mark.usefixtures("spark")


def _vocab_text(prefix: str, n: int = 40) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def _near_dup(text: str) -> str:
    words = text.split()
    words[-1] = words[-1] + "x"  # one-word change: Jaccard >> 0.5
    return " ".join(words)


BATCH1 = [
    (1, _vocab_text("alpha")),
    (2, _near_dup(_vocab_text("alpha"))),  # in-batch dup of 1
    (5, _vocab_text("bravo")),
]
BATCH2 = [
    (11, _near_dup(_vocab_text("alpha"))),  # cross-batch dup of 1
    (12, _vocab_text("charlie")),
    (13, _near_dup(_vocab_text("charlie"))),  # in-batch dup of 12
]


def _write_batch(spark, path: str, rows) -> None:
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run(spark, tmp_path) -> dict[str, str]:
    dirs = {k: str(tmp_path / k) for k in ("in", "out", "ckpt", "state")}
    _write_batch(spark, dirs["in"], BATCH1)
    q = stream_dedupe(spark, dirs["in"], dirs["out"], dirs["ckpt"], dirs["state"])
    q.awaitTermination(120)
    _write_batch(spark, dirs["in"], BATCH2)
    q = stream_dedupe(spark, dirs["in"], dirs["out"], dirs["ckpt"], dirs["state"])
    q.awaitTermination(120)
    return dirs


def test_stream_dedupe_keeps_first_seen(spark, tmp_path):
    dirs = _run(spark, tmp_path)
    kept = {r["doc_id"] for r in spark.read.parquet(dirs["out"]).collect()}
    # in-batch dup 2 and 13 dropped; cross-batch dup 11 dropped
    assert kept == {1, 5, 12}
    # state carries exactly the kept signatures, tagged by batch
    state = spark.read.parquet(dirs["state"])
    assert {r["doc_id"] for r in state.collect()} == {1, 5, 12}
    assert state.filter(F.col("batch_id") == 0).count() == 2
    assert state.filter(F.col("batch_id") == 1).count() == 1


def test_stream_dedupe_matches_batch_keepers(spark, tmp_path):
    """With batches arriving in doc_id order, the incremental keeper set
    equals the batch path's min-doc_id-per-cluster keeper set."""
    from ocr_endpoint_project_spark.operators.dedup import minhash_lsh_pairs
    from ocr_endpoint_project_spark.pipeline.dedupe import dedupe_corpus

    dirs = _run(spark, tmp_path)
    stream_kept = {r["doc_id"] for r in spark.read.parquet(dirs["out"]).collect()}

    docs = spark.createDataFrame(BATCH1 + BATCH2, "doc_id long, text string")
    batch_kept = {
        r["doc_id"]
        for r in dedupe_corpus(docs, pairs=minhash_lsh_pairs(docs)).collect()
    }
    assert stream_kept == batch_kept


def test_stream_dedupe_replay_idempotent(spark, tmp_path):
    """Re-triggering with no new input appends nothing (checkpoint), and
    a replayed batch_id already in state is skipped entirely."""
    dirs = _run(spark, tmp_path)
    n_out = spark.read.parquet(dirs["out"]).count()
    n_state = spark.read.parquet(dirs["state"]).count()
    q = stream_dedupe(spark, dirs["in"], dirs["out"], dirs["ckpt"], dirs["state"])
    q.awaitTermination(120)
    assert spark.read.parquet(dirs["out"]).count() == n_out
    assert spark.read.parquet(dirs["state"]).count() == n_state
