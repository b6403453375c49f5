"""Round-4 catalog additions, tenth batch — lakehouse semantics:
parquet schema evolution (mergeSchema across snapshot generations +
unionByName(allowMissingColumns)) and the FULL OUTER join family
(both-sides-unmatched coalesce, completing queries_ext's
inner/left/semi/anti single-pass family).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exactmath import dblround, halfup_ratio, halfup_ratio_duck
from .catalog import register, table


# ---------------------------------------------------------------------------
# Schema evolution — the data-lake staple: generation v1 writes a
# narrow schema, a later generation v2 adds a column; a mergeSchema
# read unions the footers and back-fills the missing column with NULL.
# The per-generation null accounting below is exactly the audit a
# migration runs ("which rows predate the field?"). At 100 TB
# mergeSchema=true costs a footer read per file — keep generation
# counts bounded (compaction) and pin the merged schema in the table
# catalog once it stabilizes; unionByName(allowMissingColumns=True) is
# the same semantics for in-flight frames.
def _evolution_dirs(spark: SparkSession, sf: str) -> tuple[str, str]:
    import hashlib
    import tempfile

    tag = hashlib.md5(sf.encode()).hexdigest()[:10]
    base = os.path.join(tempfile.gettempdir(), f"ade_evo_{tag}")
    v1, v2 = os.path.join(base, "v1"), os.path.join(base, "v2")
    if not (
        os.path.exists(os.path.join(v1, "_SUCCESS"))
        and os.path.exists(os.path.join(v2, "_SUCCESS"))
    ):
        orders = table(spark, sf, "orders")
        orders.where(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        ).write.mode("overwrite").parquet(v1)
        orders.where(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority",
        ).write.mode("overwrite").parquet(v2)
    return v1, v2


@register(
    "s13_schema_evolution",
    """SELECT o_orderstatus AS status,
       count(*) AS n,
       CAST(count(CASE WHEN o_orderkey % 2 = 1 THEN 1 END) AS BIGINT)
         AS n_with_priority,
       CAST(count(CASE WHEN o_orderkey % 2 = 0 THEN 1 END) AS BIGINT)
         AS n_legacy
FROM orders
GROUP BY o_orderstatus""",
)
def s13_schema_evolution(spark: SparkSession, sf: str) -> DataFrame:
    v1, v2 = _evolution_dirs(spark, sf)
    merged = spark.read.option("mergeSchema", "true").parquet(v1, v2)
    return merged.groupBy(
        F.col("o_orderstatus").alias("status")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_orderpriority").cast("long").alias(
            "n_with_priority"
        ),
        F.sum(
            F.when(F.col("o_orderpriority").isNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_legacy"),
    )


# ---------------------------------------------------------------------------
# FULL OUTER join — both-sides-unmatched semantics with coalesce over
# the join key (the reconciliation-report shape: entities present in
# either system). queries_ext's join family reads inner/left/semi/anti
# off one pass; FULL OUTER is the remaining flavor, and its
# null-extension on BOTH sides is what coalesce(key_l, key_r) exists
# for. Derived sides: per-nation counts of high-balance customers vs
# high-balance suppliers — cardinalities differ per nation, so both
# unmatched directions actually occur on the fixture.
@register(
    "rel_full_outer_family",
    """WITH c AS (
  SELECT c_nationkey AS nk, count(*) AS n_cust
  FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey),
s AS (
  SELECT s_nationkey AS nk, count(*) AS n_supp
  FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey)
SELECT coalesce(c.nk, s.nk) AS nationkey,
       CAST(coalesce(n_cust, 0) AS BIGINT) AS n_cust,
       CAST(coalesce(n_supp, 0) AS BIGINT) AS n_supp,
       (c.nk IS NOT NULL AND s.nk IS NOT NULL) AS in_both
FROM c FULL OUTER JOIN s ON c.nk = s.nk""",
)
def rel_full_outer_family(spark: SparkSession, sf: str) -> DataFrame:
    cust = (
        table(spark, sf, "customer")
        .where(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        table(spark, sf, "supplier")
        .where(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    j = cust.join(supp, cust["c_nk"] == supp["s_nk"], "full_outer")
    return j.select(
        F.coalesce(F.col("c_nk"), F.col("s_nk"))
        .cast("int")
        .alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).cast("long").alias(
            "n_cust"
        ),
        F.coalesce(F.col("n_supp"), F.lit(0)).cast("long").alias(
            "n_supp"
        ),
        (F.col("c_nk").isNotNull() & F.col("s_nk").isNotNull()).alias(
            "in_both"
        ),
    )


# ---------------------------------------------------------------------------
# Expectations summary — the data-quality report over
# operators/curation.expectations: per-rule violation counts plus the
# corpus pass count, long-form. The rule evaluation is one map-only
# projection (rules ride the scan); this rollup explodes the per-row
# failed-rule lists and adds the passed row — the DLT-style quality
# dashboard a 100 TB ingest runs per batch.
@register(
    "cur_expectations",
    """WITH checks AS (
  SELECT CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END AS v_doc_id,
         CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END
           AS v_text,
         CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END AS v_chars,
         CASE WHEN lang IS NULL
                OR lang NOT IN ('en','es','fr','de') THEN 1 ELSE 0 END
           AS v_lang
  FROM documents)
SELECT 'doc_id_present' AS rule, CAST(sum(v_doc_id) AS BIGINT) AS n
FROM checks
UNION ALL
SELECT 'text_nonempty', CAST(sum(v_text) AS BIGINT) FROM checks
UNION ALL
SELECT 'n_chars_consistent', CAST(sum(v_chars) AS BIGINT) FROM checks
UNION ALL
SELECT 'lang_supported', CAST(sum(v_lang) AS BIGINT) FROM checks
UNION ALL
SELECT 'passed_all',
       CAST(sum(CASE WHEN v_doc_id + v_text + v_chars + v_lang = 0
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM checks""",
)
def cur_expectations(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.curation import expectations

    checked = expectations(table(spark, sf, "documents"))
    viols = (
        checked.select(
            F.explode("failed_rules").alias("rule")
        )
        .groupBy("rule")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # rules with zero violations still get a row (the report contract)
    all_rules = spark.createDataFrame(
        [
            ("doc_id_present",),
            ("text_nonempty",),
            ("n_chars_consistent",),
            ("lang_supported",),
        ],
        "rule string",
    )
    full = all_rules.join(viols, "rule", "left").select(
        "rule", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n")
    )
    passed = checked.agg(
        F.sum(F.col("passed").cast("long")).cast("long").alias("n")
    ).select(F.lit("passed_all").alias("rule"), "n")
    return full.unionByName(passed)


# ---------------------------------------------------------------------------
# Matryoshka truncation eval — overlap@5 of retrieval with the leading
# 16 of 64 embedding dims vs the full vector (the MRL serving
# question: how much recall does a 4x-cheaper prefix buy?). Same
# engine-exact eval design as sim_ivf_recall: both legs rank by
# bit-identical cosine with the same tie-break over a deterministic
# probe set, so the overlap is exact. At serving scale the truncated
# leg is the candidate generator (4x less bandwidth/compute per
# vector) and the full-dim leg re-ranks its shortlist; this eval is
# the measurement that justifies the split.
_MRL_K = 5
_MRL_DIMS = 16


def _mrl_sql() -> str:
    from ..functions.vector import duck_cosine

    trunc = "list_slice({0}, 1, %d)" % _MRL_DIMS
    return f"""WITH queries AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings
  WHERE vec_id % 64 = 7),
full5 AS (
  SELECT qid, vec_id FROM (
    SELECT q.qid, e.vec_id,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY {duck_cosine("e.embedding", "q.qvec")} DESC,
                                       e.vec_id) AS rn
    FROM embeddings e CROSS JOIN queries q)
  WHERE rn <= {_MRL_K}),
trunc5 AS (
  SELECT qid, vec_id FROM (
    SELECT q.qid, e.vec_id,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY {duck_cosine(trunc.format("e.embedding"), trunc.format("q.qvec"))} DESC,
                                       e.vec_id) AS rn
    FROM embeddings e CROSS JOIN queries q)
  WHERE rn <= {_MRL_K})
SELECT full5.qid,
       CAST(count(trunc5.vec_id) AS BIGINT) AS n_overlap,
       round((count(trunc5.vec_id) / {_MRL_K}) * 1e9) / 1e9 AS overlap_at_5
FROM full5 LEFT JOIN trunc5
  ON full5.qid = trunc5.qid AND full5.vec_id = trunc5.vec_id
GROUP BY full5.qid"""


@register("emb_matryoshka_eval", _mrl_sql())
def emb_matryoshka_eval(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..functions.vector import cosine_staged, l2_norm

    emb = table(spark, sf, "embeddings")
    # norms (full and truncated) staged once per side below the join
    # (bit-exact re-grouping — functions/vector.cosine_staged)
    queries = emb.where(F.col("vec_id") % 64 == 7).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        l2_norm(F.col("embedding")).alias("_qn"),
        l2_norm(F.slice(F.col("embedding"), 1, _MRL_DIMS)).alias("_qn_t"),
    )
    embn = emb.withColumn(
        "_vn", l2_norm(F.col("embedding"))
    ).withColumn(
        "_vn_t", l2_norm(F.slice(F.col("embedding"), 1, _MRL_DIMS))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), "vec_id")

    def top5(score_col):
        return (
            embn.crossJoin(F.broadcast(queries))
            .select("qid", "vec_id", score_col.alias("score"))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= _MRL_K)
            .select("qid", "vec_id")
        )

    full5 = top5(
        cosine_staged(
            F.col("embedding"), F.col("qvec"), F.col("_vn"), F.col("_qn")
        )
    )
    trunc5 = top5(
        cosine_staged(
            F.slice(F.col("embedding"), 1, _MRL_DIMS),
            F.slice(F.col("qvec"), 1, _MRL_DIMS),
            F.col("_vn_t"),
            F.col("_qn_t"),
        )
    )
    j = full5.join(
        trunc5.withColumnRenamed("vec_id", "t_vec"),
        (full5["qid"] == trunc5["qid"])
        & (full5["vec_id"] == F.col("t_vec")),
        "left",
    )
    return j.groupBy(full5["qid"].alias("qid")).agg(
        F.count("t_vec").alias("n_overlap"),
        dblround(F.count("t_vec") / _MRL_K, 9).alias("overlap_at_5"),
    )


# ---------------------------------------------------------------------------
# BPE merge statistics — the tokenizer-training primitive (Sennrich et
# al. 2016): adjacent symbol-pair frequencies across the corpus's
# words; the argmax pair IS merge #1 of a BPE vocabulary build. Top-20
# by (count desc, pair) with a dense rank — rank 1 is the merge a
# trainer would apply next. Shape: explode words map-side (spread
# partitioning, no skew on the doc key), char pairs per word are a
# pure projection, ONE count shuffle on the pair key, top-20 via
# TakeOrderedAndProject. The full BPE loop re-runs this after each
# merge on re-tokenized words — per-iteration cost is this same
# aggregate, which is why distributed BPE trainers batch merges.
@register(
    "cur_bpe_pair_stats",
    """WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents),
c AS (SELECT regexp_extract_all(word, '.') AS chars
      FROM w WHERE length(word) >= 2),
p AS (SELECT unnest(list_zip(list_slice(chars, 1, len(chars) - 1),
                             list_slice(chars, 2, len(chars)))) AS pr
      FROM c),
cnt AS (SELECT pr[1] || pr[2] AS pair, count(*) AS n
        FROM p GROUP BY pair)
SELECT pair, n,
       CAST(row_number() OVER (ORDER BY n DESC, pair) AS BIGINT)
         AS merge_rank
FROM cnt ORDER BY n DESC, pair LIMIT 20""",
)
def cur_bpe_pair_stats(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators.dedup import spread

    docs = spread(table(spark, sf, "documents"), "doc_id")
    words = docs.select(
        F.explode(F.split("text", " ")).alias("word")
    ).where(F.length("word") >= 2)
    chars = words.select(
        F.regexp_extract_all("word", F.lit("."), 0).alias("chars")
    )
    # greatest(·, 0): a newline-only "word" passes the length guard but
    # regexp '.' matches nothing (RE2 '.' excludes \n on both engines),
    # so chars is EMPTY and an unclamped size-1 slice length of -1
    # aborts the job (parity_fuzz edge profile); DuckDB's list_slice
    # just returns [] there, so the clamp is also the oracle's value.
    n_pairs = F.greatest(F.size("chars") - 1, F.lit(0))
    pairs = chars.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("chars"), 1, n_pairs),
                F.slice(F.col("chars"), 2, n_pairs),
                lambda a, b: F.concat(a, b),
            )
        ).alias("pair")
    )
    cnt = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.desc("n"), "pair")
    return (
        cnt.withColumn(
            "merge_rank", F.row_number().over(w).cast("long")
        )
        .orderBy(F.desc("n"), "pair")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Collation-aware grouping (Spark 4 collations): case-insensitive
# aggregation via a real UTF8_LCASE collated key — not a lower()
# projection; the collation travels with the type, so joins/sorts/
# distinct downstream inherit the comparison semantics (ICU-backed at
# the engine level, exactly what a multi-source entity table needs).
# Mixed case is derived deterministically (even partkeys upper). The
# surfaced key is lower()ed for cross-engine comparison — the oracle
# mirrors the SEMANTICS with lower() grouping (DuckDB's collation
# dialect differs; results, not internals, are the contract).
@register(
    "rel_collation_ci",
    """SELECT lower(CASE WHEN p_partkey % 2 = 0 THEN upper(p_type)
                         ELSE lower(p_type) END) AS ptype,
       count(*) AS n,
       CAST(count(DISTINCT p_brand) AS BIGINT) AS n_brands
FROM part
GROUP BY ptype""",
)
def rel_collation_ci(spark: SparkSession, sf: str) -> DataFrame:
    p = table(spark, sf, "part").select(
        F.when(
            F.col("p_partkey") % 2 == 0, F.upper("p_type")
        )
        .otherwise(F.lower("p_type"))
        .alias("mixed"),
        "p_brand",
    )
    ci = p.groupBy(
        F.collate(F.col("mixed"), "UTF8_LCASE").alias("k")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("p_brand").cast("long").alias("n_brands"),
    )
    return ci.select(
        F.lower(F.col("k").cast("string")).alias("ptype"), "n", "n_brands"
    )


# ---------------------------------------------------------------------------
# ANSI-safe arithmetic — the try_* family: division that yields NULL
# instead of failing the job on a zero denominator, and casts that
# yield NULL on malformed input. Under ANSI mode (the Spark 4 default)
# the un-prefixed forms THROW — at 100 TB one malformed row must not
# kill a 10-hour job, and try_* is the row-level quarantine that keeps
# the pipeline total. Denominator: count of >100-qty lines (always 0 —
# a real all-NULL division per group); valid ratio alongside.
@register(
    "rel_try_arithmetic",
    f"""SELECT l_returnflag,
       count(*) AS n,
       CASE WHEN sum(CASE WHEN l_quantity > 100 THEN 1 ELSE 0 END) = 0
            THEN NULL
            ELSE CAST(count(*) AS DOUBLE)
                 / sum(CASE WHEN l_quantity > 100 THEN 1 ELSE 0 END)
       END AS per_jumbo,
       {halfup_ratio_duck(
           "count(*)",
           "sum(CASE WHEN l_quantity <= 50 THEN 1 ELSE 0 END)", 9)}
         AS per_normal,
       TRY_CAST('not-a-number' AS BIGINT) AS bad_parse,
       TRY_CAST('42' AS BIGINT) AS good_parse
FROM lineitem
GROUP BY l_returnflag""",
)
def rel_try_arithmetic(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("l_quantity") > 100, 1).otherwise(0)
        ).alias("jumbo"),
        F.sum(
            F.when(F.col("l_quantity") <= 50, 1).otherwise(0)
        ).alias("normal"),
    )
    return g.select(
        "l_returnflag",
        "n",
        F.try_divide(F.col("n").cast("double"), F.col("jumbo")).alias(
            "per_jumbo"
        ),
        # integer-exact HALF_UP ratio; NULL on a zero denominator =
        # the try_divide contract (ROUND8 §12 class; r9 audit — this
        # also retires the latent oracle-inf-vs-NULL mismatch)
        halfup_ratio("n", "normal", 9).alias("per_normal"),
        F.lit("not-a-number").try_cast("bigint").alias("bad_parse"),
        F.lit("42").try_cast("bigint").alias("good_parse"),
    )
