"""Similarity search over the embeddings table: brute-force cosine top-k
(the exactness baseline) and an IVF-style bucketed variant (the scale
path: restrict candidates to the query's cell, here the ``label`` column
standing in for a nearest-centroid assignment).

Scale design: queries are broadcast (Q << N); per-candidate-partition
partial top-k happens inside the window's sort (rank over qid), so N
candidates are scanned once with no all-pairs shuffle. The IVF variant
cuts the scan to one cell — at 10^12 vectors that's the only viable shape,
with the brute-force op kept as the recall oracle on samples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._io import read_spread
from ..functions.text import r4
from .dedup import cosine_expr

TOP_K = 5
N_QUERIES = 10


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_spread(spark, f"{sf_dir}/embeddings.parquet")


def q_ann_bruteforce_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    cand = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    scored = (
        cand.join(F.broadcast(queries), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            r4(cosine_expr(F.col("q_emb"), F.col("c_emb"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


SQL_ANN_BRUTEFORCE = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         floor((list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[])) * 10000 + 0.5) / 10000 AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
  WHERE q.vec_id < {N_QUERIES}
)
SELECT query_id, rank, neighbor_id, cosine
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


def q_ann_ivf_bucketed(spark, sf_dir):
    """IVF-style: candidates restricted to the query's cell (label)."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("cell"),
        F.col("embedding").alias("q_emb"),
    )
    cand = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("c_cell"),
        F.col("embedding").alias("c_emb"),
    )
    scored = (
        cand.join(
            F.broadcast(queries),
            (F.col("cell") == F.col("c_cell")) & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select(
            "query_id",
            "cell",
            "neighbor_id",
            r4(cosine_expr(F.col("q_emb"), F.col("c_emb"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cell", "rank", "neighbor_id", "cosine")
    )


SQL_ANN_IVF = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, q.label AS cell, c.vec_id AS neighbor_id,
         floor((list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[])) * 10000 + 0.5) / 10000 AS cosine
  FROM embeddings q JOIN embeddings c ON q.label = c.label AND q.vec_id != c.vec_id
  WHERE q.vec_id < {N_QUERIES}
)
SELECT query_id, cell, rank, neighbor_id, cosine
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


def q_centroid_per_cell(spark, sf_dir):
    """Cell centroids (the 'train' half of IVF): elementwise mean vector
    per label, emitted as (cell, dim, value) long form."""
    emb = _emb(spark, sf_dir)
    dim = emb.select(F.posexplode("embedding").alias("dim", "v"), F.col("label").alias("cell"))
    return dim.groupBy("cell", "dim").agg(
        r4(F.avg(F.col("v").cast("double"))).alias("centroid_value")
    )


SQL_CENTROID = """
SELECT cell, dim, floor((avg(v)) * 10000 + 0.5) / 10000 AS centroid_value
FROM (
  SELECT label AS cell,
         unnest(list_transform(range(0, len(embedding)),
                i -> {'dim': CAST(i AS INT), 'v': CAST(embedding[i + 1] AS DOUBLE)}),
                recursive := true)
  FROM embeddings
)
GROUP BY 1, 2
"""


QUERIES = {
    "ann_bruteforce_topk": q_ann_bruteforce_topk,
    "ann_ivf_bucketed": q_ann_ivf_bucketed,
    "ann_centroid_per_cell": q_centroid_per_cell,
}

ORACLES = {
    "ann_bruteforce_topk": SQL_ANN_BRUTEFORCE,
    "ann_ivf_bucketed": SQL_ANN_IVF,
    "ann_centroid_per_cell": SQL_CENTROID,
}
