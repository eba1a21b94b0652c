"""Incremental (streaming) corpus deduplication: the streaming twin of
the batch MinHash-LSH -> verify -> keeper path (operators/dedup.py,
pipeline/dedupe.py).

At 100-TB scale a corpus is never deduplicated once — new crawl batches
arrive forever, and each batch must be deduplicated BOTH against itself
AND against everything already kept. The scale shape is a persistent
SIGNATURE STATE TABLE (doc_id, hashed shingle set, MinHash signature):
per micro-batch, only the batch's signatures are computed fresh, the
band-bucket join against state is keyed (never all-pairs), and only
verified-unique documents append to the output AND to the state — so
state stays one row per kept document, exactly the batch path's
one-keeper-per-cluster invariant, maintained incrementally.

Semantics: a batch document is a duplicate if its verified Jaccard
(hashed-shingle sets, threshold JACCARD_THRESHOLD) reaches any KEPT
document from an earlier batch, or any earlier-doc_id document within
its own batch (first-seen-wins — the incremental analog of the batch
keeper's min-doc_id rule; the two agree whenever batch arrival order
respects doc_id order, which the equivalence test pins).

Replay/commit discipline mirrors streaming/incremental.py: the state
append carries ``batch_id``; a replayed micro-batch whose batch_id is
already in state is skipped entirely (idempotent). The keeper OUTPUT is
itself replay-safe (round-5 fix): keepers land in a batch_id-partitioned
layout written with dynamic partition overwrite, so a crash between the
output write and the state append replays the batch and REPLACES its
output partition instead of appending duplicates to the one table whose
contract is uniqueness. The signature-state append remains the commit
point (written last).

Cross-batch hot-shingle state (round-5, closing the documented r4 blind
spot): a persistent ``(h, df, batch_id)`` table at ``state_dir +
"_shingle_df"`` accumulates per-batch shingle document frequencies. Each
batch's signatures are capped against the CUMULATIVE df (prior state +
this batch), so a shingle cool within every micro-batch but hot across
thousands of them is still dropped from the signature/banding leg —
without this, many small batches re-open the O(df^2) band-join blowup
the batch path's ``_cap_hashed`` closed. The verify leg keeps FULL
shingle sets, exactly like the batch path. Rows are keyed by batch_id,
so a replayed append deduplicates on read; the table grows with distinct
shingles and is compactable with jobs/compact_job (aggregate + rewrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators import dedup as _dedup
from ..operators.dedup import (
    JACCARD_THRESHOLD,
    LSH_ROWS_PER_BAND,
    MINHASH_P,
    MINHASH_PERMS,
    _cap_hashed,
    _doc_tokens,
    _shingles,
)
from ..functions.text import shingle_hash32

_SIG_COLS = [f"mh{i}" for i in range(len(MINHASH_PERMS))]


def signature_frame(docs: DataFrame, hot: DataFrame | None = None) -> DataFrame:
    """(doc_id, hs, mh0..mhN) over any (doc_id, text) frame: hashed
    shingle SET (array<bigint>, 28-bit md5 domain) plus the MinHash
    signature of its df-capped stream — the same construction the batch
    LSH path pins (operators/dedup.minhash_lsh_pairs). Documents with
    no shingles (too short) keep an empty hs and a null signature; they
    can never collide in a band, so they are always kept.

    ``hot``: optional (h) frame of stop-shingle hashes to exclude from
    the signature leg (broadcast anti-join). When given it REPLACES the
    within-frame cap: the stream passes cumulative hot sets that already
    subsume any shingle hot within this one batch."""
    # token array hoisted (operators/dedup._doc_tokens): the shingle
    # lambda slices it per element — round-8 CollapseProject fix
    hs = _doc_tokens(docs).select(
        "doc_id",
        F.array_distinct(
            F.transform(_shingles(F.col("t")), lambda s: shingle_hash32(s))
        ).alias("hs"),
    )
    hashed = hs.select("doc_id", F.explode("hs").alias("h"))
    if hot is not None:
        capped = hashed.join(F.broadcast(hot.select("h")), "h", "left_anti")
    else:
        capped = _cap_hashed(hashed)
    sig = capped.groupBy("doc_id").agg(
        *[
            F.min((F.col("h") * a + b) % MINHASH_P).alias(f"mh{i}")
            for i, (a, b) in enumerate(MINHASH_PERMS)
        ]
    )
    return hs.join(sig, "doc_id", "left")


def _bands(sig: DataFrame) -> DataFrame:
    """Explode a signature frame into (doc_id, hs, band_id, band_key)."""
    n_bands = len(MINHASH_PERMS) // LSH_ROWS_PER_BAND
    return sig.select(
        "doc_id",
        "hs",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band_id"),
                        F.concat_ws(
                            "_",
                            *[
                                F.col(f"mh{bi * LSH_ROWS_PER_BAND + r}")
                                for r in range(LSH_ROWS_PER_BAND)
                            ],
                        ).alias("band_key"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "hs", "band.band_id", "band.band_key").filter(
        F.col("band_key") != ""  # null-signature (shingle-less) docs never band
    )


def _verified_dup_ids(batch_sig: DataFrame, state_sig: DataFrame | None) -> DataFrame:
    """doc_ids of batch documents that verify as duplicates of state
    documents or of earlier-doc_id batch documents."""
    nb = _bands(batch_sig).alias("nb")
    legs = []
    if state_sig is not None:
        st = _bands(state_sig).alias("st")
        legs.append(
            nb.join(
                st,
                (F.col("nb.band_id") == F.col("st.band_id"))
                & (F.col("nb.band_key") == F.col("st.band_key")),
            ).select(
                F.col("nb.doc_id").alias("doc_id"),
                F.col("st.doc_id").alias("old_id"),
                F.col("nb.hs").alias("hs_new"),
                F.col("st.hs").alias("hs_old"),
            )
        )
    prior = _bands(batch_sig).alias("pr")
    legs.append(
        nb.join(
            prior,
            (F.col("nb.band_id") == F.col("pr.band_id"))
            & (F.col("nb.band_key") == F.col("pr.band_key"))
            & (F.col("pr.doc_id") < F.col("nb.doc_id")),  # first-seen wins
        ).select(
            F.col("nb.doc_id").alias("doc_id"),
            F.col("pr.doc_id").alias("old_id"),
            F.col("nb.hs").alias("hs_new"),
            F.col("pr.hs").alias("hs_old"),
        )
    )
    cand = legs[0]
    for leg in legs[1:]:
        cand = cand.unionByName(leg)
    jac = F.size(F.array_intersect("hs_new", "hs_old")).cast("double") / F.size(
        F.array_union("hs_new", "hs_old")
    )
    return (
        cand.dropDuplicates(["doc_id", "old_id"])  # multi-band hits count once
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_id")
        .distinct()
    )


def stream_dedupe(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    schema: str = "doc_id long, text string",
    available_now: bool = True,
) -> StreamingQuery:
    """Start the incremental dedup stream: parquet documents in ->
    deduplicated keepers out, with the signature state table at
    ``state_dir`` growing by exactly the kept rows of each batch."""
    docs = spark.readStream.schema(schema).parquet(input_dir)
    writer = (
        docs.writeStream.foreachBatch(make_batch_handler(spark, out_dir, state_dir))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedupe_icetable(
    spark: SparkSession,
    table_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Incremental dedup fed by an ICETABLE instead of a directory: the
    ``icetable`` data source (sources/icetable_source.py) turns the
    table's snapshot log into the offset axis, so each committed append
    becomes exactly one dedup micro-batch and a restarted query resumes
    at the last processed snapshot via Spark's checkpoint. This is the
    production shape for "dedupe a continuously-ingested corpus table":
    the ingest side appends snapshots, the dedup side consumes them
    exactly once — no file-listing race, no shared directory contract.

    The table must carry ``doc_id``/``text`` columns; everything else
    (partition column, ``_commit_snapshot_id``) is dropped before the
    batch handler so state/output schemas match :func:`stream_dedupe`.
    """
    from ..sources.icetable_source import register_icetable

    register_icetable(spark)
    docs = (
        spark.readStream.format("icetable")
        .option("path", table_dir)
        .load()
        .select("doc_id", "text")
    )
    writer = (
        docs.writeStream.foreachBatch(make_batch_handler(spark, out_dir, state_dir))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


COMPACTED_BATCH_ID = -1  # sentinel for folded rows in the shingle-df state


def _recover_compaction_swap(spark: SparkSession, df_state_dir: str) -> None:
    """If a compaction crashed between moving the live shingle-df dir
    aside and moving the new one into place (dst missing, dst_old
    present), restore the aside copy so no reader ever sees an
    empty-state window."""
    jvm = spark._jvm
    dst = jvm.org.apache.hadoop.fs.Path(df_state_dir)
    fs = dst.getFileSystem(spark._jsc.hadoopConfiguration())
    old = jvm.org.apache.hadoop.fs.Path(df_state_dir + "_old")
    if not fs.exists(dst) and fs.exists(old):
        fs.rename(old, dst)


def compact_shingle_df_state(spark: SparkSession, state_dir: str) -> dict:
    """Fold the append-only ``(h, df, batch_id)`` shingle-frequency state
    into one row per shingle, bounding its growth at O(distinct shingles)
    instead of O(batches x shingles-per-batch).

    Only rows whose batch_id is COMMITTED (present in the signature
    state, or already folded) are compacted: an uncommitted batch's rows
    may be re-appended by a crash replay, and folding them first would
    double-count when replay-dedup on (batch_id, h) no longer sees the
    original rows. Uncommitted rows are carried through verbatim.
    Returns {"rows_before", "rows_after"}."""
    from pyspark.errors import AnalysisException

    df_state_dir = state_dir.rstrip("/") + "_shingle_df"
    _recover_compaction_swap(spark, df_state_dir)
    try:
        df_state = spark.read.parquet(df_state_dir)
    except AnalysisException:
        return {"rows_before": 0, "rows_after": 0}
    try:
        committed = {
            r["batch_id"]
            for r in spark.read.parquet(state_dir).select("batch_id").distinct().collect()
        }
    except AnalysisException:
        committed = set()
    committed.add(COMPACTED_BATCH_ID)
    rows_before = df_state.count()
    clean = df_state.dropDuplicates(["batch_id", "h"])
    foldable = clean.filter(F.col("batch_id").isin(list(committed)))
    carried = clean.filter(~F.col("batch_id").isin(list(committed)))
    folded = (
        foldable.groupBy("h")
        .agg(F.sum("df").alias("df"))
        .withColumn("batch_id", F.lit(COMPACTED_BATCH_ID))
    )
    out = folded.unionByName(carried.select("h", "df", "batch_id"))
    # write-swap via a temp dir (Hadoop FS API, so file:/hdfs:/s3a: all
    # work — same round-5 rule as jobs/compact_job): the state is never
    # half-rewritten in place
    tmp = df_state_dir + "_compacting"
    out.write.mode("overwrite").parquet(tmp)
    rows_after = spark.read.parquet(tmp).count()
    # swap order (round-6 fix): rename the live dir ASIDE first, then the
    # new dir into place, then delete the old copy — a crash at any point
    # leaves either the live dir or the _old copy on disk, never a window
    # where the state is silently gone (the reader treats a missing dir
    # as empty, which would degrade hot-shingle capping without error)
    jvm = spark._jvm
    dst = jvm.org.apache.hadoop.fs.Path(df_state_dir)
    fs = dst.getFileSystem(spark._jsc.hadoopConfiguration())
    old = jvm.org.apache.hadoop.fs.Path(df_state_dir + "_old")
    if fs.exists(old):  # leftover from a crash after a completed swap
        fs.delete(old, True)
    fs.rename(dst, old)
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), dst)
    fs.delete(old, True)
    return {"rows_before": rows_before, "rows_after": rows_after}


def make_batch_handler(spark: SparkSession, out_dir: str, state_dir: str):
    """The per-micro-batch handler (exposed so the crash/replay window —
    output written, state not yet — is directly testable)."""
    from pyspark.errors import AnalysisException

    df_state_dir = state_dir.rstrip("/") + "_shingle_df"

    def _read_or_none(path: str) -> DataFrame | None:
        try:
            return spark.read.parquet(path)
        except AnalysisException as e:
            if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                return None
            raise

    def _cumulative_df(batch_counts: DataFrame, batch_id: int) -> DataFrame:
        """(h, df) cumulative document frequency: prior state + batch.
        Prior rows deduplicate on (batch_id, h), and rows carrying THIS
        batch_id are excluded entirely: a crashed attempt writes its df
        rows before the commit point, so on replay the recomputed
        ``batch_counts`` already covers them — unioning both would
        double-count the batch and could flip near-cap shingles hot only
        on replay, breaking stream==batch equivalence (round-6 fix)."""
        _recover_compaction_swap(spark, df_state_dir)
        prior = _read_or_none(df_state_dir)
        if prior is None:
            return batch_counts
        prior = (
            prior.filter(F.col("batch_id") != batch_id)
            .dropDuplicates(["batch_id", "h"])
            .select("h", "df")
        )
        return (
            batch_counts.unionByName(prior).groupBy("h").agg(F.sum("df").alias("df"))
        )

    def _handle(batch_df, batch_id: int) -> None:
        state = _read_or_none(state_dir)
        if state is not None and state.filter(F.col("batch_id") == batch_id).limit(1).count():
            return  # checkpoint replay of a committed batch — idempotent skip
        batch_df = batch_df.persist()
        # per-batch shingle df, then the CUMULATIVE hot set (state + batch):
        # a shingle cool in every batch but hot across them still gets capped
        batch_counts = (
            _doc_tokens(batch_df).select(
                "doc_id",
                F.explode(
                    F.array_distinct(
                        F.transform(
                            _shingles(F.col("t")), lambda s: shingle_hash32(s)
                        )
                    )
                ).alias("h"),
            )
            .groupBy("h")
            .agg(F.count(F.lit(1)).alias("df"))
            .persist()
        )
        hot = _cumulative_df(batch_counts, batch_id).filter(
            F.col("df") > _dedup.SHINGLE_DF_CAP
        ).select("h")
        sig = signature_frame(batch_df, hot=hot).persist()
        dups = _verified_dup_ids(
            sig, state.drop("batch_id") if state is not None else None
        )
        keepers = sig.join(dups, "doc_id", "left_anti")
        # replay-safe output: each batch owns one partition, written with
        # dynamic overwrite — a replayed batch REPLACES its partition
        (
            batch_df.join(keepers.select("doc_id"), "doc_id", "left_semi")
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )
        # df state BEFORE the commit point; replay dedupes on (batch_id, h)
        batch_counts.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(df_state_dir)
        # commit point: state appended only after the keeper write returned
        keepers.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            state_dir
        )
        sig.unpersist()
        batch_counts.unpersist()
        batch_df.unpersist()

    return _handle
