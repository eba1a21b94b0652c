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
already in state is skipped entirely (idempotent), and the state write
is the commit point (after the keeper data write).

Df-cap caveat: the hot-shingle cap (SHINGLE_DF_CAP) is applied within
each batch's shingle stream. A shingle hot across many small batches
but cool within each would need a persistent hot-shingle state table —
documented trade-off, not built (the cap exists to bound the band join,
and the band join here is bounded per batch by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import (
    JACCARD_THRESHOLD,
    LSH_ROWS_PER_BAND,
    MINHASH_P,
    MINHASH_PERMS,
    _cap_hashed,
    _shingles,
)
from ..functions.text import norm_tokens, shingle_hash32

_SIG_COLS = [f"mh{i}" for i in range(len(MINHASH_PERMS))]


def signature_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, hs, mh0..mhN) over any (doc_id, text) frame: hashed
    shingle SET (array<bigint>, 28-bit md5 domain) plus the MinHash
    signature of its df-capped stream — the same construction the batch
    LSH path pins (operators/dedup.minhash_lsh_pairs). Documents with
    no shingles (too short) keep an empty hs and a null signature; they
    can never collide in a band, so they are always kept."""
    hs = docs.select(
        "doc_id",
        F.array_distinct(
            F.transform(_shingles(norm_tokens("text")), lambda s: shingle_hash32(s))
        ).alias("hs"),
    )
    hashed = hs.select("doc_id", F.explode("hs").alias("h"))
    sig = _cap_hashed(hashed).groupBy("doc_id").agg(
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
    from pyspark.errors import AnalysisException

    docs = spark.readStream.schema(schema).parquet(input_dir)

    def _read_state() -> DataFrame | None:
        try:
            return spark.read.parquet(state_dir)
        except AnalysisException as e:
            if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                return None
            raise

    def _handle(batch_df, batch_id: int) -> None:
        state = _read_state()
        if state is not None and state.filter(F.col("batch_id") == batch_id).limit(1).count():
            return  # checkpoint replay of a committed batch — idempotent skip
        batch_df = batch_df.persist()
        sig = signature_frame(batch_df).persist()
        dups = _verified_dup_ids(
            sig, state.drop("batch_id") if state is not None else None
        )
        keepers = sig.join(dups, "doc_id", "left_anti")
        batch_df.join(keepers.select("doc_id"), "doc_id", "left_semi").write.mode(
            "append"
        ).parquet(out_dir)
        # commit point: state appended only after the keeper write returned
        keepers.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            state_dir
        )
        sig.unpersist()
        batch_df.unpersist()

    writer = (
        docs.writeStream.foreachBatch(_handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
