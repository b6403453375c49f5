"""SQL API surface + incremental streaming index tests."""

import json
import time

from pyspark.sql import functions as F

from ade_agente_documental_empresarial___miner_a_spark.plans.sqlapi import (
    register_sql_api,
)
from ade_agente_documental_empresarial___miner_a_spark.streaming.ingest import (
    incremental_index,
    stream_documents,
)


def test_sql_only_retrieval(spark, sf_dir):
    register_sql_api(spark, sf_dir)
    rows = spark.sql(
        """
        WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, cosine_sim(embedding, q.qvec) AS score
        FROM embeddings CROSS JOIN q
        ORDER BY score DESC, vec_id LIMIT 4
        """
    ).collect()
    assert len(rows) == 4
    assert rows[0].vec_id == 0 and abs(rows[0].score - 1.0) < 1e-9
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_sql_title_predicate_and_cost(spark, sf_dir):
    register_sql_api(spark, sf_dir)
    r = spark.sql(
        """SELECT is_title('  MERGE PHASE ') AS t1, is_title('Ab cd') AS t2,
                  is_title('AB') AS t3,
                  ws_token_count('a b c') AS n,
                  chat_cost_usd(100, 10) AS cost"""
    ).collect()[0]
    assert r.t1 is True and r.t2 is False and r.t3 is False
    assert r.n == 3
    assert abs(r.cost - (100 * 0.00001 + 10 * 0.00003)) < 1e-12


def test_sql_events_view_normalized(spark, sf_dir):
    register_sql_api(spark, sf_dir)
    r = spark.sql(
        "SELECT count(*) AS n, min(ts) AS lo FROM events"
    ).collect()[0]
    assert r.n > 0
    assert r.lo.year == 2024  # nanos handled, real timestamps


def write_doc_file(dirpath, docs):
    dirpath.mkdir(parents=True, exist_ok=True)
    p = dirpath / f"docs_{time.time_ns()}.json"
    with open(p, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")


def test_incremental_index_appends(spark, tmp_path):
    src = tmp_path / "incoming"
    idx = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    write_doc_file(
        src,
        [
            {"doc_id": 1, "text": "FIRST SECTION\n\nalpha beta gamma", "lang": "en", "source": "s1"},
        ],
    )
    q = incremental_index(stream_documents(spark, str(src)), idx, ckpt)
    q.awaitTermination()
    first = spark.read.parquet(idx)
    assert first.count() == 1
    assert first.collect()[0].section == "FIRST SECTION"

    # second batch appends without touching the first (incremental, not
    # the reference's full rebuild)
    write_doc_file(
        src,
        [
            {"doc_id": 2, "text": "delta epsilon", "lang": "en", "source": "s2"},
        ],
    )
    q2 = incremental_index(stream_documents(spark, str(src)), idx, ckpt)
    q2.awaitTermination()
    after = spark.read.parquet(idx)
    assert after.count() == 2
    assert {r.doc_id for r in after.collect()} == {1, 2}
    emb = after.where(F.col("doc_id") == 2).collect()[0].embedding
    assert len(emb) == 64


def test_incremental_index_batch_retry_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a batch retried after the write
    but before the checkpoint commit must REPLACE its own output, not
    append a duplicate (ADVICE r9 — the batch_id=N overwrite layout)."""
    from ade_agente_documental_empresarial___miner_a_spark.plans.pipeline import (
        build_chunks,
    )

    idx = str(tmp_path / "index")
    docs = spark.createDataFrame(
        [(1, "FIRST SECTION\n\nalpha beta gamma", "en", "s1")],
        "doc_id long, text string, lang string, source string",
    )
    # simulate the sink body twice with the SAME batch_id (a retry)
    import os

    for _ in range(2):
        build_chunks(docs, dim=64).write.mode("overwrite").parquet(
            os.path.join(idx, "batch_id=0")
        )
    after = spark.read.parquet(idx)
    assert after.count() == 1  # not 2: the retry replaced itself
    assert after.collect()[0].section == "FIRST SECTION"
