"""Exact-substring dedup semantics (operators/dedup.py, Lee et al. 2022
shape): the oracle gate proves Spark==DuckDB, these prove the ALGORITHM —
the globally first occurrence survives, later copies vanish, short docs
pass through untouched."""

from __future__ import annotations

from ocr_endpoint_project_spark.operators.dedup import (
    SUB_L,
    q_dedup_substring,
    q_dedup_substring_rebuild,
)


def _write_docs(spark, tmp_path, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_first_occurrence_survives_later_copies_removed(spark, tmp_path):
    window = " ".join(f"w{i}" for i in range(SUB_L))  # one exact window
    texts = [
        window + " tail0 unique zero",   # doc 0: first occurrence (keeper)
        window + " tail1 unique one",    # doc 1: copy -> window dropped
        "totally different words " + " ".join(f"x{i}" for i in range(SUB_L)),
        "short doc",                     # < SUB_L tokens: no windows at all
    ]
    sf = _write_docs(spark, tmp_path, texts)

    stats = {r["doc_id"]: r for r in q_dedup_substring(spark, sf).collect()}
    assert stats[0]["n_dup_windows"] == 0
    assert stats[1]["n_dup_windows"] == 1
    assert stats[1]["n_dup_tokens"] == SUB_L
    assert stats[2]["n_dup_windows"] == 0
    assert stats[3]["n_windows"] == 0 and stats[3]["n_dup_windows"] == 0

    reb = {r["doc_id"]: r for r in q_dedup_substring_rebuild(spark, sf).collect()}
    assert reb[0]["rebuilt_text"] == texts[0]          # keeper intact
    assert reb[1]["rebuilt_text"] == "tail1 unique one"  # copy stripped
    assert reb[2]["rebuilt_text"] == texts[2]
    assert reb[3]["rebuilt_text"] == texts[3]          # short doc untouched
    assert reb[1]["n_kept_tokens"] == 3


def test_within_doc_repetition_is_deduped(spark, tmp_path):
    window = " ".join(f"r{i}" for i in range(SUB_L))
    filler = " ".join(f"f{i}" for i in range(SUB_L))  # breaks window overlap
    sf = _write_docs(spark, tmp_path, [f"{window} {filler} {window}"])
    reb = q_dedup_substring_rebuild(spark, sf).collect()[0]
    # the second in-doc copy of the window is removed, the first kept
    assert reb["rebuilt_text"] == f"{window} {filler}"
    assert reb["n_kept_tokens"] == 2 * SUB_L
