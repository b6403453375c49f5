"""Unit tests for the corpus-curation operators (pii scrub, repetition
signals, deterministic split, decontamination) on constructed inputs with
hand-computed expectations."""

from pyspark.sql import functions as F

from ade_agente_documental_empresarial___miner_a_spark.operators.curation import (
    contamination_pairs,
    hash_split,
    pii_scrub,
    repetition_signals,
    split_bucket,
    word_ngrams,
)


def test_pii_scrub_counts_and_redacts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.co and c.d@e-f.org now"),
            (2, "call 555-1234 or 555-9999"),
            (3, "clean text no pii"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert rows[1].n_emails == 2 and rows[1].n_phones == 0
    assert rows[1].scrubbed == "mail <EMAIL> and <EMAIL> now"
    assert rows[2].n_phones == 2
    assert rows[2].scrubbed == "call <PHONE> or <PHONE>"
    assert rows[3].scrubbed == "clean text no pii"


def test_word_ngrams_preserves_frequency(spark):
    df = spark.createDataFrame([(1, "a b a b a")], "doc_id long, text string")
    grams = df.select(
        F.explode(word_ngrams(F.col("text"), 2)).alias("g")
    ).groupBy("g").count().collect()
    counts = {r.g: r["count"] for r in grams}
    # positional bigrams: "a b" x2, "b a" x2 — distinct-ing would lose this
    assert counts == {"a b": 2, "b a": 2}


def test_repetition_signals_known_doc(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            (2, "each of twelve entirely unique tokens makes this sentence pass every threshold"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_signals(df).collect()}
    spam = rows[1]
    assert spam.n_words == 4 and spam.n_distinct == 1
    assert spam.top_word_frac == 1.0 and spam.top_bigram_frac == 1.0
    assert not spam.keep
    clean = rows[2]
    assert clean.distinct_ratio == 1.0
    assert clean.top_word_frac == 1.0 / 12
    assert clean.top_bigram_frac == 1.0 / 11  # 11 distinct bigrams of 11
    assert clean.keep


def test_hash_split_deterministic_and_complete(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    out = hash_split(df)
    a = {r.doc_id: (r.bucket, r.split) for r in out.collect()}
    b = {r.doc_id: (r.bucket, r.split) for r in hash_split(df).collect()}
    assert a == b  # stable across runs
    assert all(0 <= v[0] < 100 for v in a.values())
    frac_train = sum(1 for v in a.values() if v[1] == "train") / 1000
    assert 0.7 < frac_train < 0.9  # md5 buckets roughly uniform
    assert {v[1] for v in a.values()} == {"train", "valid", "test"}


def test_split_bucket_matches_reimplementation(spark):
    import hashlib

    df = spark.range(0, 50).select(
        F.col("id").alias("doc_id"), split_bucket(F.col("id")).alias("b")
    )
    for r in df.collect():
        h = hashlib.md5(f"split:{r.doc_id}".encode()).hexdigest()
        assert r.b == int(h[:4], 16) % 100


def test_contamination_pairs_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words appear in this document"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps high")], "doc_id long, text string"
    )
    out = contamination_pairs(corpus, bench, min_overlap=2).collect()
    # doc 1 shares "quick brown fox" + "brown fox jumps" with the benchmark
    assert len(out) == 1
    assert out[0].doc_id == 1 and out[0].bench_id == 100
    assert out[0].n_overlap == 2


def test_contamination_excludes_self(spark):
    docs = spark.createDataFrame(
        [(1, "one two three four five")], "doc_id long, text string"
    )
    assert contamination_pairs(docs, docs, min_overlap=1).count() == 0


def test_pack_sequences_partitions_all_docs(spark):
    from ade_agente_documental_empresarial___miner_a_spark.plans.queries_curation import (
        cur_pack_sequences,
    )

    out = cur_pack_sequences(spark, "/root/testdata/sf0.001").collect()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_docs = docs.count()
    total_tokens = docs.selectExpr(
        "sum(size(split(text, ' '))) t"
    ).collect()[0].t
    assert sum(r.n_docs for r in out) == n_docs  # every doc packed once
    assert sum(r.seq_tokens for r in out) == total_tokens
    for r in out:
        assert r.first_doc <= r.last_doc
        assert 0 <= r.seq_id


def test_pack_sequences_seq_ids_contiguous_per_shard(spark):
    from collections import defaultdict

    from ade_agente_documental_empresarial___miner_a_spark.plans.queries_curation import (
        cur_pack_sequences,
    )

    out = cur_pack_sequences(spark, "/root/testdata/sf0.001").collect()
    shards = defaultdict(list)
    for r in out:
        shards[(r.source, r.bucket)].append(r.seq_id)
    for ids in shards.values():
        assert sorted(ids) == list(range(len(ids)))  # 0..n-1, no gaps


def test_quantized_dot_error_bound(spark):
    """int8 quantization error: per-element error <= 0.5*scale, so
    |approx_dot - exact_dot| <= 0.5*sb*sum|a| + 0.5*sa*sum|b| + d*0.25*sa*sb."""
    from ade_agente_documental_empresarial___miner_a_spark.functions.vector import (
        abs_max,
        dot,
        int_dot,
        quantize_i8,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("ida"), F.col("embedding").alias("va")
    )
    b = emb.where((F.col("vec_id") >= 20) & (F.col("vec_id") < 40)).select(
        F.col("vec_id").alias("idb"), F.col("embedding").alias("vb")
    )
    pairs = a.crossJoin(b)
    sa = F.greatest(abs_max(F.col("va")), F.lit(1e-30)) / 127.0
    sb = F.greatest(abs_max(F.col("vb")), F.lit(1e-30)) / 127.0
    qa = quantize_i8(F.col("va"), sa * 127.0)
    qb = quantize_i8(F.col("vb"), sb * 127.0)
    abssum = lambda v: F.aggregate(  # noqa: E731
        v, F.lit(0.0), lambda s, x: s + F.abs(x.cast("double"))
    )
    out = pairs.select(
        (int_dot(qa, qb).cast("double") * sa * sb).alias("approx"),
        dot(F.col("va"), F.col("vb")).alias("exact"),
        (
            0.5 * sb * abssum(F.col("va"))
            + 0.5 * sa * abssum(F.col("vb"))
            + F.size(F.col("va")) * 0.25 * sa * sb
        ).alias("bound"),
    ).collect()
    assert len(out) == 400
    for r in out:
        assert abs(r.approx - r.exact) <= r.bound + 1e-12


def test_source_quota_caps_and_is_deterministic(spark):
    from ade_agente_documental_empresarial___miner_a_spark.operators.curation import (
        source_quota,
    )

    df = spark.createDataFrame(
        [(i, f"d{i % 3}") for i in range(30)], "doc_id long, source string"
    )
    out = source_quota(df, quota=4, domain_col="source")
    kept = out.where("kept").groupBy("source").count().collect()
    assert {r["count"] for r in kept} == {4}
    # hash order, not id order: the kept set is not simply the lowest ids
    kept_ids = sorted(r.doc_id for r in out.where("kept").collect())
    assert kept_ids != sorted(r.doc_id for r in df.limit(12).collect())
    # deterministic across re-evaluation
    again = sorted(
        r.doc_id for r in source_quota(df, quota=4).where("kept").collect()
    )
    assert again == kept_ids


def test_stratified_sample_rates_and_no_shuffle(spark):
    from ade_agente_documental_empresarial___miner_a_spark.operators.curation import (
        stratified_sample,
    )

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "fr") for i in range(400)],
        "doc_id long, lang string",
    )
    out = stratified_sample(df, {"en": 10}, default_pct=90)
    frac = {
        r.lang: r.n
        for r in out.where("sampled").groupBy("lang").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert frac["en"] < 0.25 * 200 and frac["fr"] > 0.75 * 200
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only contract


def test_length_bucket_batches_shapes(spark):
    from ade_agente_documental_empresarial___miner_a_spark.operators.curation import (
        length_bucket_batches,
    )

    df = spark.createDataFrame(
        [(i, 50 + (i % 4) * 200) for i in range(40)],
        "doc_id long, n_chars long",
    )
    out = length_bucket_batches(df, bucket_chars=128, batch_size=8).collect()
    for r in out:
        assert r.len_bucket == r.n_chars // 128
    # every batch except a bucket's last is exactly batch_size
    from collections import Counter

    sizes = Counter((r.len_bucket, r.batch_id) for r in out)
    per_bucket = Counter(r.len_bucket for r in out)
    for (b, bid), n in sizes.items():
        last_bid = (per_bucket[b] - 1) // 8
        assert n == 8 or bid == last_bid
