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


def _sig_cols():
    from ocr_endpoint_project_spark.streaming.dedupe_stream import _SIG_COLS

    return _SIG_COLS


def test_stream_dedupe_cross_batch_hot_shingle_capped(spark, tmp_path, monkeypatch):
    """Round 5: a shingle COOL within every batch (df 2 <= cap 3) but HOT
    cumulatively (df 4 after two batches) must be dropped from later
    batches' signature legs — the persistent (h, df) state closes the r4
    per-batch blind spot that re-opened the O(df^2) band blowup under
    many small micro-batches."""
    from pyspark.sql import functions as F

    from ocr_endpoint_project_spark.operators import dedup
    from ocr_endpoint_project_spark.streaming.dedupe_stream import (
        make_batch_handler,
        signature_frame,
    )

    monkeypatch.setattr(dedup, "SHINGLE_DF_CAP", 3)
    dirs = {k: str(tmp_path / k) for k in ("out", "state")}
    handler = make_batch_handler(spark, dirs["out"], dirs["state"])

    # shared prefix sized so half of each doc's shingles are shared
    # (capping them must move the minhash) while pairwise Jaccard
    # (~14/42 = 0.33) stays below the 0.5 dup threshold
    prefix = " ".join(f"common{k}" for k in range(16))
    mk = lambda i: (i, prefix + " " + " ".join(f"u{i}w{j}" for j in range(10)))
    b0, b1 = [mk(1), mk(2)], [mk(3), mk(4)]
    schema = "doc_id long, text string"
    handler(spark.createDataFrame(b0, schema), 0)
    handler(spark.createDataFrame(b1, schema), 1)

    # df state: prefix shingles reach cumulative df 4 > cap 3
    df_state = spark.read.parquet(dirs["state"] + "_shingle_df")
    cum = df_state.groupBy("h").agg(F.sum("df").alias("df"))
    hot = cum.filter(F.col("df") > 3).select("h")
    assert hot.count() > 0, "shared prefix shingles must be cumulatively hot"
    # and each hot shingle was cool (df <= 3) within every single batch
    assert df_state.filter(F.col("df") > 3).count() == 0

    state = spark.read.parquet(dirs["state"])
    cols = ["doc_id"] + _sig_cols()

    def rows(df):
        return {tuple(r) for r in df.select(*cols).collect()}

    # batch-0 signatures were computed before the shingles turned hot
    uncapped0 = signature_frame(spark.createDataFrame(b0, schema))
    assert rows(state.filter(F.col("batch_id") == 0)) == rows(uncapped0)
    # batch-1 signatures exclude the cumulatively-hot shingles...
    capped1 = signature_frame(spark.createDataFrame(b1, schema), hot=hot)
    assert rows(state.filter(F.col("batch_id") == 1)) == rows(capped1)
    # ...and genuinely differ from what the uncapped path would produce
    uncapped1 = signature_frame(spark.createDataFrame(b1, schema))
    assert rows(state.filter(F.col("batch_id") == 1)) != rows(uncapped1)


def test_stream_dedupe_output_survives_crash_before_commit(spark, tmp_path):
    """Round 5: the keeper output is batch_id-partitioned and written
    with dynamic overwrite, so a crash BETWEEN the output write and the
    state append (simulated: state wiped after the handler ran) replays
    the batch and REPLACES its partition — no duplicate keepers in the
    one table whose contract is uniqueness."""
    import shutil

    from pyspark.sql import functions as F

    from ocr_endpoint_project_spark.streaming.dedupe_stream import make_batch_handler

    dirs = {k: str(tmp_path / k) for k in ("out", "state")}
    handler = make_batch_handler(spark, dirs["out"], dirs["state"])
    schema = "doc_id long, text string"
    b0 = spark.createDataFrame(BATCH1, schema)

    handler(b0, 0)
    first = spark.read.parquet(dirs["out"])
    kept_ids = {r["doc_id"] for r in first.collect()}
    assert kept_ids == {1, 5}

    # crash window: output + df-state written, signature state was not
    shutil.rmtree(dirs["state"])
    handler(b0, 0)  # checkpoint replays the batch

    replayed = spark.read.parquet(dirs["out"])
    assert {r["doc_id"] for r in replayed.collect()} == {1, 5}
    assert replayed.count() == len(kept_ids)  # replaced, not appended
    # df state deduplicates the double append on (batch_id, h): cumulative
    # counts equal a single clean run's
    df_state = spark.read.parquet(dirs["state"] + "_shingle_df")
    assert df_state.count() > df_state.dropDuplicates(["batch_id", "h"]).count()
    cum = (
        df_state.dropDuplicates(["batch_id", "h"])
        .groupBy("h")
        .agg(F.sum("df").alias("df"))
    )
    assert cum.filter(F.col("df") > 2).count() == 0  # 3 docs, max df 2

    # the stream continues cleanly: batch 1 still dedups against state
    handler(spark.createDataFrame(BATCH2, schema), 1)
    final = {r["doc_id"] for r in spark.read.parquet(dirs["out"]).collect()}
    assert final == {1, 5, 12}


def test_shingle_df_state_compaction(spark, tmp_path):
    """Round 5: the append-only (h, df, batch_id) state folds to one row
    per shingle — but ONLY committed batches fold; an uncommitted
    batch's rows are carried verbatim so a crash replay's (batch_id, h)
    dedup still sees them. Cumulative counts are identical before and
    after, and the stream keeps running correctly on the compacted
    state."""
    from pyspark.sql import functions as F

    from ocr_endpoint_project_spark.streaming.dedupe_stream import (
        COMPACTED_BATCH_ID,
        compact_shingle_df_state,
        make_batch_handler,
    )

    dirs = {k: str(tmp_path / k) for k in ("out", "state")}
    handler = make_batch_handler(spark, dirs["out"], dirs["state"])
    schema = "doc_id long, text string"
    handler(spark.createDataFrame(BATCH1, schema), 0)
    handler(spark.createDataFrame(BATCH2, schema), 1)
    df_dir = dirs["state"] + "_shingle_df"

    def cum():
        return {
            r["h"]: r["s"]
            for r in spark.read.parquet(df_dir)
            .dropDuplicates(["batch_id", "h"])
            .groupBy("h")
            .agg(F.sum("df").alias("s"))
            .collect()
        }

    before = cum()
    # simulate an UNCOMMITTED batch 2: df rows appended, signature state not
    uncommitted = spark.createDataFrame([(999, 7, 2)], "h long, df long, batch_id int")
    uncommitted.write.mode("append").parquet(df_dir)
    before[999] = 7

    stats = compact_shingle_df_state(spark, dirs["state"])
    assert stats["rows_after"] < stats["rows_before"]
    after_df = spark.read.parquet(df_dir)
    assert cum() == before  # cumulative counts preserved exactly
    # committed rows folded to the sentinel; the uncommitted row survives
    ids = {r["batch_id"] for r in after_df.select("batch_id").distinct().collect()}
    assert ids == {COMPACTED_BATCH_ID, 2}
    # replay of the uncommitted batch's df append still dedups correctly
    uncommitted.write.mode("append").parquet(df_dir)
    assert cum() == before

    # the stream continues on compacted state: new batch dedups vs state
    handler(spark.createDataFrame([(21, BATCH1[0][1] + " x")], schema), 3)
    kept = {r["doc_id"] for r in spark.read.parquet(dirs["out"]).collect()}
    assert 21 not in kept  # near-dup of doc 1, caught against state


def test_stream_dedupe_replay_shingle_df_not_double_counted(
    spark, tmp_path, monkeypatch
):
    """Round 6 (ADVICE): a crash-replayed batch's df rows are already in
    the shingle-df state (written before the commit point); the replay
    recomputes the same counts, and unioning BOTH would double the
    batch's df — flipping near-cap shingles hot only on replay and
    producing different signatures than a clean run. The cumulative-df
    builder must exclude prior rows carrying the replayed batch_id."""
    import shutil

    from pyspark.sql import functions as F

    from ocr_endpoint_project_spark.operators import dedup
    from ocr_endpoint_project_spark.streaming.dedupe_stream import (
        make_batch_handler,
        signature_frame,
    )

    # 3 docs share a prefix -> prefix shingle df 3 == cap 3 (cool in a
    # clean run); the bug would see 3 prior + 3 recomputed = 6 > 3 (hot)
    monkeypatch.setattr(dedup, "SHINGLE_DF_CAP", 3)
    dirs = {k: str(tmp_path / k) for k in ("out", "state")}
    handler = make_batch_handler(spark, dirs["out"], dirs["state"])
    prefix = " ".join(f"common{k}" for k in range(16))
    mk = lambda i: (i, prefix + " " + " ".join(f"u{i}w{j}" for j in range(10)))
    schema = "doc_id long, text string"
    b0 = spark.createDataFrame([mk(1), mk(2), mk(3)], schema)

    handler(b0, 0)
    cols = ["doc_id"] + _sig_cols()
    rows = lambda df: {tuple(r) for r in df.select(*cols).collect()}
    clean = rows(spark.read.parquet(dirs["state"]))

    # crash window: output + df rows written, signature state not
    shutil.rmtree(dirs["state"])
    handler(b0, 0)  # replay

    replayed = rows(spark.read.parquet(dirs["state"]))
    assert replayed == clean
    # the clean run's signatures are the UNCAPPED ones (df == cap is cool)
    assert replayed == rows(signature_frame(b0))
    # sanity: df cumulative counts also match a single clean run
    cum = (
        spark.read.parquet(dirs["state"] + "_shingle_df")
        .dropDuplicates(["batch_id", "h"])
        .groupBy("h")
        .agg(F.sum("df").alias("df"))
    )
    assert cum.filter(F.col("df") > 3).count() == 0


def test_shingle_df_compaction_swap_crash_recovery(spark, tmp_path):
    """Round 6 (ADVICE): the compaction swap renames the live dir ASIDE
    before moving the new one in — a crash between the two steps leaves
    a recoverable ``_old`` copy, and readers restore it instead of
    silently treating the state as empty (which would degrade
    hot-shingle capping without any error)."""
    import os

    from pyspark.sql import functions as F

    from ocr_endpoint_project_spark.streaming.dedupe_stream import (
        compact_shingle_df_state,
        make_batch_handler,
    )

    dirs = {k: str(tmp_path / k) for k in ("out", "state")}
    handler = make_batch_handler(spark, dirs["out"], dirs["state"])
    schema = "doc_id long, text string"
    handler(spark.createDataFrame(BATCH1, schema), 0)
    df_dir = dirs["state"] + "_shingle_df"

    def cum():
        return {
            r["h"]: r["s"]
            for r in spark.read.parquet(df_dir)
            .dropDuplicates(["batch_id", "h"])
            .groupBy("h")
            .agg(F.sum("df").alias("s"))
            .collect()
        }

    before = cum()
    # simulate the crash window: live dir moved aside, new dir never landed
    os.rename(df_dir, df_dir + "_old")
    stats = compact_shingle_df_state(spark, dirs["state"])  # recovers, then folds
    assert stats["rows_before"] > 0
    assert cum() == before
    assert not os.path.exists(df_dir + "_old")

    # same crash window, recovery via the batch handler's read path
    os.rename(df_dir, df_dir + "_old")
    handler(spark.createDataFrame(BATCH2, schema), 1)
    kept = {r["doc_id"] for r in spark.read.parquet(dirs["out"]).collect()}
    assert kept == {1, 5, 12}  # cross-batch dup 11 still caught
    assert 999 not in cum()  # state restored, not re-created empty


def test_stream_dedupe_from_icetable_matches_batch(spark, tmp_path):
    """Dedup fed by the icetable data source: one committed append = one
    micro-batch, checkpoint resumes at the last processed snapshot, and
    the keeper set equals the batch path over the full corpus."""
    from ocr_endpoint_project_spark.operators.dedup import minhash_lsh_pairs
    from ocr_endpoint_project_spark.pipeline.dedupe import dedupe_corpus
    from ocr_endpoint_project_spark.sources.icetable import IceTable
    from ocr_endpoint_project_spark.streaming import stream_dedupe_icetable

    tdir = str(tmp_path / "table")
    dirs = {k: str(tmp_path / k) for k in ("out", "ckpt", "state")}
    t = IceTable.create(tdir, partition_col=None, stat_cols=["doc_id"])
    t.append(spark.createDataFrame(BATCH1, "doc_id long, text string"))
    q = stream_dedupe_icetable(spark, tdir, dirs["out"], dirs["ckpt"], dirs["state"])
    q.awaitTermination(120)
    t.append(spark.createDataFrame(BATCH2, "doc_id long, text string"))
    q = stream_dedupe_icetable(spark, tdir, dirs["out"], dirs["ckpt"], dirs["state"])
    q.awaitTermination(120)

    stream_kept = {r["doc_id"] for r in spark.read.parquet(dirs["out"]).collect()}
    docs = spark.createDataFrame(BATCH1 + BATCH2, "doc_id long, text string")
    batch_kept = {
        r["doc_id"]
        for r in dedupe_corpus(docs, pairs=minhash_lsh_pairs(docs)).collect()
    }
    assert stream_kept == batch_kept == {1, 5, 12}
    # replay with nothing new: no growth
    q = stream_dedupe_icetable(spark, tdir, dirs["out"], dirs["ckpt"], dirs["state"])
    q.awaitTermination(120)
    assert spark.read.parquet(dirs["out"]).count() == len(stream_kept)
