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


def test_write_clustered_yields_skippable_minmax_spans(spark, tmp_path):
    """Range-clustered layout contract: per-file user_id [min,max] spans
    are near-disjoint, so stats-based row-group skipping can serve a
    point predicate from ~1 of the files (verified on the parquet
    footers via DuckDB, engine-neutrally)."""
    import duckdb

    from ade_agente_documental_empresarial___miner_a_spark.plans.catalog import (
        events_table,
    )
    from ade_agente_documental_empresarial___miner_a_spark.sources.layout import (
        write_clustered,
    )
    from tests.conftest import SF001_DIR

    out = str(tmp_path / "events_clustered")
    ev = events_table(spark, SF001_DIR).select("event_id", "user_id", "value")
    write_clustered(ev, out, "user_id", n_files=8)

    spans = duckdb.connect().execute(
        f"""SELECT file_name,
               min(CAST(stats_min_value AS BIGINT)) AS lo,
               max(CAST(stats_max_value AS BIGINT)) AS hi
        FROM parquet_metadata('{out}/*.parquet')
        WHERE path_in_schema = 'user_id'
        GROUP BY file_name ORDER BY lo"""
    ).fetchall()
    assert len(spans) == 8
    global_lo = min(s[1] for s in spans)
    global_hi = max(s[2] for s in spans)
    # spans may touch at boundaries (equal keys straddle a cut) but a
    # point predicate must hit at most 2 of the 8 files
    for probe in (global_lo, (global_lo + global_hi) // 2, global_hi):
        hits = [s for s in spans if s[1] <= probe <= s[2]]
        assert 1 <= len(hits) <= 2, (probe, hits)
    # and the summed span width must be ~the global width (disjointness),
    # not 8x it (which is what an unclustered write gives)
    total_width = sum(s[2] - s[1] for s in spans)
    assert total_width <= (global_hi - global_lo) * 1.25
