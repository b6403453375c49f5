"""Round-4 catalog additions, thirteenth batch — lakehouse maintenance
and corpus-statistics shapes:

* dynamic partition overwrite (the backfill/repair primitive: rewrite
  ONE hive partition in place, siblings untouched);
* deterministic rare-class oversampling (the training-mix upsampling
  stage: integer repeat factors from group counts, explode-replicated);
* median absolute deviation (robust spread — the outlier-resistant
  sibling of stddev, two grouped exact-median passes);
* distribution-drift terms (per-term KL contributions between the
  English and German unigram distributions — the corpus-drift audit
  that tells you WHICH terms moved, not just that a divergence number
  grew; same round(ln·,9)-quantization discipline as the trigram LM).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exactmath import dblround
from .catalog import register, table


# ---------------------------------------------------------------------------
# S15 — dynamic partition overwrite: with
# spark.sql.sources.partitionOverwriteMode=dynamic, an INSERT OVERWRITE
# touches ONLY the partitions present in the incoming frame (static
# mode would drop every partition first). Here: a base table hive-
# partitioned by o_orderstatus, then the 'F' partition re-priced ×2 and
# dynamically overwritten — 'O'/'P' files are never rewritten (unit
# test pins their survival). This is the backfill/repair primitive at
# 100 TB: fixing one bad day/status means rewriting that partition's
# files only, and the scan after repair prunes to the same partition.
def _dpo_dir(spark: SparkSession, sf: str) -> str:
    tag = hashlib.md5(sf.encode()).hexdigest()[:10]
    out = os.path.join(tempfile.gettempdir(), f"ade_dpo_{tag}")
    marker = os.path.join(out, "_ADE_REPAIRED")
    if os.path.exists(marker):
        return out
    orders = table(spark, sf, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(
        out
    )
    repaired = (
        spark.read.parquet(out)
        .where(F.col("o_orderstatus") == "F")
        .withColumn("o_totalprice", F.col("o_totalprice") * 2.0)
    )
    with _dynamic_overwrite(spark):
        repaired.write.mode("overwrite").partitionBy(
            "o_orderstatus"
        ).parquet(out)
    with open(marker, "w") as fh:
        fh.write("ok")
    return out


from contextlib import contextmanager  # noqa: E402


@contextmanager
def _dynamic_overwrite(spark: SparkSession):
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "STATIC")
    spark.conf.set(key, "dynamic")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


@register(
    "s15_dynamic_partition_overwrite",
    """SELECT o_orderstatus AS status, count(*) AS n_orders,
       CAST(sum(CAST(CASE WHEN o_orderstatus = 'F'
                     THEN o_totalprice * 2.0 ELSE o_totalprice END
                AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders GROUP BY o_orderstatus""",
)
def s15_dynamic_partition_overwrite(
    spark: SparkSession, sf: str
) -> DataFrame:
    out = _dpo_dir(spark, sf)
    return (
        spark.read.parquet(out)
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# Rare-class oversampling — the deterministic upsampling stage of a
# training mix: each language's repeat factor is floor(max_n / n_lang)
# (the majority class stays at 1×), and every doc is replicated exactly
# factor times via explode(sequence(1, factor)). No randomness — the
# factor comes from exact group counts, so the output composition is
# reproducible run-over-run (the property a data-mix card depends on).
# Shape: one tiny lang-count aggregate broadcast back onto the scan,
# then a map-side explode — no second shuffle for the replication.
@register(
    "cur_oversample_rare",
    """WITH counts AS (
  SELECT lang, count(*) AS n FROM documents GROUP BY lang),
mx AS (SELECT max(n) AS max_n FROM counts),
factors AS (
  -- explicit floor: DuckDB CAST(double AS BIGINT) ROUNDS while Spark
  -- truncates — floor() first makes both engines agree
  SELECT lang, n, CAST(floor(max_n / n) AS BIGINT) AS factor
  FROM counts, mx),
replicated AS (
  SELECT d.lang, unnest(generate_series(1, f.factor)) AS replica
  FROM documents d JOIN factors f ON d.lang = f.lang)
SELECT f.lang, f.n AS n_before, f.factor,
       (SELECT count(*) FROM replicated r WHERE r.lang = f.lang)
         AS n_after
FROM factors f""",
)
def cur_oversample_rare(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    mx = counts.agg(F.max("n").alias("max_n"))
    factors = counts.crossJoin(F.broadcast(mx)).select(
        "lang",
        "n",
        F.floor(F.col("max_n") / F.col("n")).cast("long").alias("factor"),
    )
    replicated = (
        docs.join(F.broadcast(factors), "lang")
        .select(
            "lang",
            F.explode(
                F.sequence(F.lit(1), F.col("factor").cast("int"))
            ).alias("replica"),
        )
    )
    after = replicated.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_after")
    )
    return factors.join(after, "lang").select(
        "lang",
        F.col("n").alias("n_before"),
        "factor",
        "n_after",
    )


# ---------------------------------------------------------------------------
# Median absolute deviation — robust spread per group: MAD = median of
# |x − median(x)|. Two grouped exact-median passes (the first median
# joins back onto the rows); the interpolation arithmetic ((a+b)/2 on
# doubles) is identical on both engines, and |x − med| is one exact
# IEEE subtract. The right measure when l_extendedprice outliers would
# swamp a stddev; at 100 TB each pass is one grouped percentile
# (sort-based within group), and the approx_percentile contract entry
# is the sketch-based fallback when exactness can be traded.
@register(
    "rel_mad_robust",
    """WITH med AS (
  SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med_price
  FROM lineitem GROUP BY l_returnflag)
SELECT l.l_returnflag, count(*) AS n, med_price,
       quantile_cont(abs(l.l_extendedprice - med_price), 0.5) AS mad_price
FROM lineitem l JOIN med ON med.l_returnflag = l.l_returnflag
GROUP BY l.l_returnflag, med_price""",
)
def rel_mad_robust(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    med = li.groupBy("l_returnflag").agg(
        F.median("l_extendedprice").alias("med_price")
    )
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag", "med_price")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.median(
                F.abs(F.col("l_extendedprice") - F.col("med_price"))
            ).alias("mad_price"),
        )
        .select("l_returnflag", "n", "med_price", "mad_price")
    )


# ---------------------------------------------------------------------------
# Distribution-drift terms — per-term KL contributions between the
# English and German unigram distributions (add-one smoothing over the
# union vocabulary): contrib(t) = p_en(t) · ln(p_en(t)/p_de(t)),
# surfaced as the top-20 largest contributors. This is the drift audit
# that answers WHICH terms moved. Determinism: counts and vocab size
# are exact integers; the single ln() is round(·,9)-quantized (the
# trigram-LM discipline — ln carries a 1-ulp JVM/glibc license) and the
# product round(·,12)-quantized, so ordering and values agree across
# engines. Top-20 is TakeOrderedAndProject with a term tiebreak.
@register(
    "text_drift_terms",
    """WITH words AS (
  SELECT lang, unnest(string_split(text, ' ')) AS term
  FROM documents WHERE lang IN ('en', 'de')),
freq AS (
  SELECT term,
         count(CASE WHEN lang = 'en' THEN 1 END) AS c_en,
         count(CASE WHEN lang = 'de' THEN 1 END) AS c_de
  FROM words WHERE term <> '' GROUP BY term),
tot AS (
  SELECT sum(c_en) AS t_en, sum(c_de) AS t_de, count(*) AS v FROM freq),
probs AS (
  SELECT term,
         CAST(c_en + 1 AS DOUBLE) / CAST(t_en + v AS DOUBLE) AS p_en,
         CAST(c_de + 1 AS DOUBLE) / CAST(t_de + v AS DOUBLE) AS p_de
  FROM freq, tot)
SELECT term, p_en, p_de,
       round((p_en * (round(ln(p_en / p_de) * 1e9) / 1e9)) * 1e12)
         / 1e12 AS kl_contrib
FROM probs
ORDER BY kl_contrib DESC, term ASC LIMIT 20""",
)
def text_drift_terms(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents").where(
        F.col("lang").isin("en", "de")
    )
    words = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("term")
    ).where(F.col("term") != "")
    freq = words.groupBy("term").agg(
        F.count(F.when(F.col("lang") == "en", 1)).alias("c_en"),
        F.count(F.when(F.col("lang") == "de", 1)).alias("c_de"),
    )
    tot = freq.agg(
        F.sum("c_en").alias("t_en"),
        F.sum("c_de").alias("t_de"),
        F.count(F.lit(1)).alias("v"),
    )
    probs = freq.crossJoin(F.broadcast(tot)).select(
        "term",
        (
            (F.col("c_en") + 1).cast("double")
            / (F.col("t_en") + F.col("v")).cast("double")
        ).alias("p_en"),
        (
            (F.col("c_de") + 1).cast("double")
            / (F.col("t_de") + F.col("v")).cast("double")
        ).alias("p_de"),
    )
    return (
        probs.select(
            "term",
            "p_en",
            "p_de",
            dblround(
                F.col("p_en")
                * dblround(F.log(F.col("p_en") / F.col("p_de")), 9),
                12,
            ).alias("kl_contrib"),
        )
        .orderBy(F.desc("kl_contrib"), F.asc("term"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# LSH dedup recall — the eval harness for the dedup scale path (the
# sibling of sim_ivf_recall on the ANN side): how many of the EXACT
# Jaccard-≥0.3 pairs does the MinHash-LSH candidates→verify pipeline
# find at the catalog's 8-perm/4-band config? Verified pairs are a
# subset of the exact set by construction (candidates are exact-
# verified), so recall = |verified| ∩ |exact| / |exact| measures pure
# candidate-generation loss. Engine-exact: both legs are integer pair
# counts, one division at the end. This is the number that justifies
# (or indicts) a band/permutation config before a 100 TB run — sharper
# configs (32/8, the bench's scale leg) trade signature cost for
# recall, and this entry is how the trade is measured.
def _lsh_recall_oracle() -> str:
    from .queries_ext import _BAND_SELECTS, _SIG_COLS, _duck_shingles

    return f"""WITH {_duck_shingles(2)},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
excommon AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.lang = b.lang
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
exact AS (
  SELECT doc_a, doc_b FROM excommon
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_common AS DOUBLE)
        / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.3),
sig AS (SELECT doc_id, {_SIG_COLS} FROM sh GROUP BY doc_id),
bands AS ({_BAND_SELECTS}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id < b.doc_id),
vcommon AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b),
lshp AS (
  SELECT doc_a, doc_b FROM vcommon
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_common AS DOUBLE)
        / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.3)
SELECT (SELECT count(*) FROM exact) AS n_exact,
       (SELECT count(*) FROM exact e
        JOIN lshp l ON l.doc_a = e.doc_a AND l.doc_b = e.doc_b)
         AS n_found,
       CAST((SELECT count(*) FROM exact e
             JOIN lshp l ON l.doc_a = e.doc_a AND l.doc_b = e.doc_b)
            AS DOUBLE)
       / CAST((SELECT count(*) FROM exact) AS DOUBLE) AS recall"""


@register("dedup_lsh_recall", _lsh_recall_oracle())
def dedup_lsh_recall(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.dedup import jaccard_pairs, lsh_verified_pairs

    docs = table(spark, sf, "documents")
    exact = jaccard_pairs(docs, threshold=0.3).select("doc_a", "doc_b")
    lshp = lsh_verified_pairs(docs, threshold=0.3).select(
        "doc_a", "doc_b"
    )
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    n_found = exact.join(lshp, ["doc_a", "doc_b"]).agg(
        F.count(F.lit(1)).alias("n_found")
    )
    return n_exact.crossJoin(n_found).select(
        "n_exact",
        "n_found",
        # try_divide: a corpus with NO true near-dup pairs has recall
        # NULL (0/0), matching DuckDB's x/0 → NULL — plain ANSI division
        # would abort the job on a clean corpus (parity_fuzz, random).
        F.try_divide(
            F.col("n_found").cast("double"),
            F.col("n_exact").cast("double"),
        ).alias("recall"),
    )


# ---------------------------------------------------------------------------
# Bag-semantics set ops — intersectAll/exceptAll keep DUPLICATE
# multiplicities (per value: min(m_a, m_b) copies, resp. max(0,
# m_a − m_b)), where rel_set_ops covers the distinct forms. The oracle
# states the multiplicity arithmetic directly (engine-independent
# ground truth for what ALL-variants must produce); the Spark side runs
# the actual intersectAll/exceptAll operators and re-aggregates. Both
# compile to one count-aggregate per side plus a join — bag set ops at
# 100 TB are exactly as expensive as the grouped counts they reduce to.
@register(
    "rel_set_ops_all",
    """WITH a AS (
  SELECT o_orderpriority AS pri, count(*) AS m
  FROM orders WHERE o_orderstatus = 'O' GROUP BY o_orderpriority),
b AS (
  SELECT o_orderpriority AS pri, count(*) AS m
  FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority)
SELECT 'intersect_all' AS tag, a.pri, least(a.m, b.m) AS n
FROM a JOIN b ON a.pri = b.pri
WHERE least(a.m, b.m) > 0
UNION ALL
SELECT 'except_all' AS tag, a.pri,
       a.m - coalesce(b.m, 0) AS n
FROM a LEFT JOIN b ON a.pri = b.pri
WHERE a.m - coalesce(b.m, 0) > 0""",
)
def rel_set_ops_all(spark: SparkSession, sf: str) -> DataFrame:
    orders = table(spark, sf, "orders")
    a = orders.where(F.col("o_orderstatus") == "O").select(
        F.col("o_orderpriority").alias("pri")
    )
    b = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_orderpriority").alias("pri")
    )
    inter = (
        a.intersectAll(b)
        .groupBy("pri")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("tag"), "pri", "n")
    )
    exc = (
        a.exceptAll(b)
        .groupBy("pri")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("tag"), "pri", "n")
    )
    return inter.unionByName(exc)


# ---------------------------------------------------------------------------
# Metadata-filtered ANN — the filtered-vector-search serving shape: the
# IVF index is built on the FULL corpus (codebook + cell assignment
# unchanged), and the metadata predicate (label = 3) applies to the
# probed candidates at query time — pre-filtering the corpus before
# indexing would be a different (and wrong) contract, since the index
# is shared across every filter. Because filtering thins each probed
# cell, production filtered search widens nprobe — this entry runs
# nprobe=6 vs sim_ivf_topk's 4, making the recall/selectivity trade
# explicit. Same determinism discipline as the other IVF entries
# (Lloyd-refined codebook, score DESC + vec_id tiebreaks).
def _ivf_filtered_oracle() -> str:
    from ..functions.vector import duck_cosine
    from .queries_ext import _DUCK_IVF_CODEBOOK

    qid, nprobe, k, target = 7, 6, 5, 3
    return f"""WITH {_DUCK_IVF_CODEBOOK},
assign AS (
  SELECT e.vec_id, e.label, e.embedding, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {duck_cosine("e.embedding", "c.cvec")} DESC,
                                     c.cid DESC) AS rn
  FROM embeddings e CROSS JOIN cent c),
cells AS (SELECT vec_id, label, embedding, cid AS cell FROM assign WHERE rn = 1),
q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = {qid}),
qc AS (SELECT c.cid FROM cent c, q
       ORDER BY {duck_cosine("c.cvec", "q.qvec")} DESC, c.cid DESC LIMIT {nprobe}),
scored AS (
  SELECT ce.vec_id, ce.label, {duck_cosine("ce.embedding", "q.qvec")} AS score
  FROM cells ce, q
  WHERE ce.cell IN (SELECT cid FROM qc) AND ce.label = {target}),
ranked AS (
  SELECT vec_id, label, score,
         row_number() OVER (ORDER BY score DESC, vec_id) AS rnk
  FROM scored)
SELECT vec_id, label, score, rnk FROM ranked WHERE rnk <= {k}"""


@register("sim_ivf_filtered", _ivf_filtered_oracle())
def sim_ivf_filtered(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.vector import cosine_staged, l2_norm
    from ..operators.ann import (
        _cell_scores,
        ivf_assign_arrow,
        lloyd_refine_codebook,
    )

    qid, nprobe, k, target, n_cent = 7, 6, 5, 3, 16
    emb = table(spark, sf, "embeddings")
    cents = lloyd_refine_codebook(emb, n_cent, iters=1)
    assigned = ivf_assign_arrow(emb, n_cent, cents=cents)
    probed = F.slice(
        F.sort_array(_cell_scores(F.col("_qvec"), cents), asc=False),
        1,
        nprobe,
    )
    q = (
        emb.where(F.col("vec_id") == qid)
        .select(
            F.col("embedding").alias("_qvec"),
            # norms staged once per side below the join (bit-exact
            # re-grouping — functions/vector.cosine_staged)
            l2_norm(F.col("embedding")).alias("_qn"),
        )
        .withColumn(
            "_cells",
            F.transform(probed, lambda s: s["cid"].cast("long")),
        )
    )
    cand = (
        assigned.withColumn("_vn", l2_norm(F.col("embedding")))
        .join(
            F.broadcast(q),
            F.array_contains(F.col("_cells"), F.col("cell")),
        )
        .where(F.col("label") == target)
    )
    scored = cand.select(
        "vec_id",
        "label",
        cosine_staged(
            F.col("embedding"), F.col("_qvec"), F.col("_vn"), F.col("_qn")
        ).alias("score"),
    )
    top = scored.orderBy(F.desc("score"), "vec_id").limit(k)
    w = Window.orderBy(F.desc("score"), "vec_id")
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))
