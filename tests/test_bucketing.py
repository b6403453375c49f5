"""Bucketed-index co-location: a section-keyed join of two bucketed
tables must plan WITHOUT any shuffle Exchange (the 100 TB story for
section-filtered retrieval joins)."""

import pyspark.sql.functions as F

from ade_agente_documental_empresarial___miner_a_spark.plans.pipeline import (
    build_chunks,
    load_index,
    save_index,
)


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (i, f"SECTION {'ALPHA' if i % 2 else 'BETA'}\n\nbody text {i} "
                f"with several words to chunk")
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    chunks = build_chunks(docs, with_embedding=False)

    ref_a = save_index(chunks, str(tmp_path / "idx_a"), buckets=4)
    ref_b = save_index(chunks, str(tmp_path / "idx_b"), buckets=4)
    assert "/" not in ref_a  # bucketed → catalog table name

    a = load_index(spark, ref_a)
    b = load_index(spark, ref_b).select(
        "section", F.col("chunk_id").alias("other_chunk")
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = a.join(b, "section").groupBy("section").count()
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # bucket co-location: SortMergeJoin with NO Exchange under it
    assert "SortMergeJoin" in plan
    join_part = plan.split("SortMergeJoin", 1)[1]
    assert "Exchange" not in join_part, join_part[:800]


def test_bucketed_roundtrip_preserves_rows(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"plain text {i}") for i in range(10)],
        "doc_id long, text string",
    )
    chunks = build_chunks(docs, with_embedding=False)
    ref = save_index(chunks, str(tmp_path / "idx_rt"), buckets=2)
    loaded = load_index(spark, ref)
    assert loaded.count() == chunks.count()
    assert set(loaded.columns) == set(chunks.columns)
