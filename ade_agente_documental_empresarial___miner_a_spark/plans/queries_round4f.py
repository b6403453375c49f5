"""Round-4 catalog additions, sixth batch — the last un-exercised
engine API surfaces, each as a first-class oracle-paired entry:

* Python UDTF + SQL LATERAL (``func_udtf_sentences``) — the reference's
  helper functions are UDTF-shaped (SURVEY §2.10, ``extraer_titulos`` /
  ``procesar_texto_con_gerarquía``, app.py:73-107); this registers a
  real ``@udtf`` and drives it through ``LATERAL`` table-function SQL.
* Correlated LATERAL subquery with per-row ORDER BY/LIMIT
  (``rel_lateral_topk``) — the SQL-surface twin of K3's window top-k.
* VariantType semi-structured extraction (``rel_variant_props``) —
  ``parse_json`` → binary variant → typed ``variant_get`` paths; the
  open-schema scale path (parse once, no per-access re-parse).
* pandas GROUPED_AGG UDAF (``agg_gini_nation``) — custom aggregate over
  Arrow batches; Gini concentration of account balances per nation.
* SemDeDup-style semantic dedup (``dedup_semantic``, Abbas et al. 2023,
  arXiv:2303.09540) — cluster embeddings with the Lloyd-refined IVF
  codebook, prune within-cluster cosine-similar vectors; the embedding
  sibling of the MinHash-LSH text path.

Parity discipline follows the established recipes: integer sums stay
exact int64, final float expressions are written with one fixed
operation order on both engines (bit-identical IEEE), and any
fold-order-sensitive float work is quantized before aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register, table


# ---------------------------------------------------------------------------
# Python UDTF + LATERAL — per-document term vector as a table function.
# The UDTF is the API-surface exercise (reference §2.10: text → rows,
# the shape of ``extraer_titulos``); the engine's PRODUCTION tokenizer
# stays the pure-expression explode/split path (JVM-side, codegen'd).
# A row-at-a-time Python UDTF is the slow lane and is priced
# accordingly: this entry is capability coverage, not a hot-path
# recommendation. Contract: one row per distinct single-space-separated
# word per document with its in-document count — deterministic and
# exactly SQL-mirrorable.
def _make_termvec_udtf():
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, n int")
    class TermVec:
        def eval(self, text):  # noqa: D102 — UDTF contract
            from collections import Counter

            counts = Counter(
                w for w in (text or "").split(" ") if w
            )
            for w in sorted(counts):
                yield w, counts[w]

    return TermVec


@register(
    "func_udtf_termvec",
    """SELECT doc_id, w AS word, CAST(count(*) AS INTEGER) AS n
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      FROM documents)
WHERE w <> ''
GROUP BY doc_id, w""",
)
def func_udtf_termvec(spark: SparkSession, sf: str) -> DataFrame:
    spark.udtf.register("term_vec", _make_termvec_udtf())
    table(spark, sf, "documents").createOrReplaceTempView(
        "_udtf_docs_src"
    )
    return spark.sql(
        """SELECT d.doc_id, t.word, t.n
           FROM _udtf_docs_src d, LATERAL term_vec(d.text) t"""
    )


# ---------------------------------------------------------------------------
# Correlated LATERAL subquery — per-nation top-3 customers by balance,
# expressed as the SQL-standard lateral join (per outer row: ORDER BY +
# LIMIT). Catalyst rewrites this into the same WindowGroupLimit /
# per-group top-k physical shape as K3 — the lateral form is the
# SQL-surface contract, not a different engine strategy; no per-row
# re-scan survives optimization. c_acctbal doubles compare exactly.
@register(
    "rel_lateral_topk",
    """SELECT n.n_name AS nation, t.c_custkey, t.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_custkey, c_acctbal
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 3) t""",
)
def rel_lateral_topk(spark: SparkSession, sf: str) -> DataFrame:
    table(spark, sf, "nation").createOrReplaceTempView("_lat_nation")
    table(spark, sf, "customer").createOrReplaceTempView("_lat_customer")
    return spark.sql(
        """SELECT n.n_name AS nation, t.c_custkey, t.c_acctbal
           FROM _lat_nation n,
           LATERAL (
             SELECT c_custkey, c_acctbal
             FROM _lat_customer c
             WHERE c.c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC, c_custkey
             LIMIT 3) t"""
    )


# ---------------------------------------------------------------------------
# VariantType extraction — events.props parsed ONCE into the binary
# variant encoding, then typed variant_get paths feed the rollup.
# Versus rel_json_props (get_json_object re-parses the string per
# access), variant is the 100 TB shape: parse cost paid once at ingest,
# every downstream access is a binary traversal, and shredded storage
# can push paths into the scan. Rollup: per event type × k-decile.
@register(
    "rel_variant_props",
    """SELECT event_type,
       CAST(floor(CAST(json_extract_string(props, '$.k') AS BIGINT)
                  / 10.0) AS BIGINT) AS k_decile,
       count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS k_sum
FROM events
GROUP BY event_type, k_decile""",
)
def rel_variant_props(spark: SparkSession, sf: str) -> DataFrame:
    from .catalog import events_table

    ev = events_table(spark, sf)
    v = ev.select(
        "event_type", F.parse_json(F.col("props")).alias("pv")
    ).select(
        "event_type",
        F.variant_get(F.col("pv"), "$.k", "long").alias("k"),
    )
    return v.groupBy(
        "event_type",
        F.floor(F.col("k") / 10.0).cast("long").alias("k_decile"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").cast("long").alias("k_sum"),
    )


# ---------------------------------------------------------------------------
# pandas GROUPED_AGG UDAF — Gini concentration of customer account
# balances per nation. The custom-aggregate API exercise (Arrow batch
# in, scalar out), with the exact-integer parity recipe: balances
# become exact cents (int64), the sorted index-weighted sum and the
# plain sum are exact int64 arithmetic (no float fold anywhere), and
# the single final expression converts to double in one fixed operation
# order — bit-identical on both engines, so no rounding is needed.
#   G = (2·Σ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ),  xᵢ ascending, i = 1..n
def _make_gini_udaf():
    # functionType is explicit (not type-hint-inferred): this module uses
    # ``from __future__ import annotations``, so the hints are strings and
    # the locally-imported ``pd`` name is unresolvable at inference time.
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    @pandas_udf("double", functionType=PandasUDFType.GROUPED_AGG)
    def gini_cents(cents, key):
        import numpy as np

        c = cents.to_numpy(dtype="int64")
        k = key.to_numpy(dtype="int64")
        order = np.lexsort((k, c))
        x = c[order]
        n = len(x)
        i = np.arange(1, n + 1, dtype="int64")
        six = int((i * x).sum())
        sx = int(x.sum())
        return (2.0 * six - (n + 1.0) * sx) / ((n * 1.0) * sx)

    return gini_cents


@register(
    "agg_gini_nation",
    """WITH x AS (
  SELECT n.n_name AS nation,
         CAST(round(c.c_acctbal * 100) AS BIGINT) AS cents,
         c.c_custkey,
         row_number() OVER (
           PARTITION BY n.n_name
           ORDER BY CAST(round(c.c_acctbal * 100) AS BIGINT), c.c_custkey
         ) AS i
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
s AS (
  SELECT nation, count(*) AS n, sum(i * cents) AS six, sum(cents) AS sx
  FROM x GROUP BY nation)
SELECT nation,
       CAST(n AS BIGINT) AS n_customers,
       (2.0 * six - (n + 1.0) * sx) / ((n * 1.0) * sx) AS gini
FROM s
WHERE sx <> 0""",
)
def agg_gini_nation(spark: SparkSession, sf: str) -> DataFrame:
    cust = table(spark, sf, "customer")
    nat = table(spark, sf, "nation")
    x = cust.join(
        F.broadcast(nat),
        cust["c_nationkey"] == nat["n_nationkey"],
    ).select(
        F.col("n_name").alias("nation"),
        F.round(F.col("c_acctbal") * 100)
        .cast("long")
        .alias("cents"),
        "c_custkey",
    )
    gini = _make_gini_udaf()
    # Spark refuses to mix a GROUPED_AGG pandas UDF with JVM aggregates
    # in one agg ([INVALID_PANDAS_UDF_PLACEMENT]); the counts ride a
    # separate 25-row aggregate joined back broadcast-side.
    g = x.groupBy("nation").agg(
        gini(F.col("cents"), F.col("c_custkey")).alias("gini")
    )
    counts = x.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("_sx"),
    )
    return (
        g.join(F.broadcast(counts), "nation")
        .where(F.col("_sx") != 0)
        .select("nation", "n_customers", "gini")
    )


# ---------------------------------------------------------------------------
# Batch mirror of streaming/chat_stream.tws_type_counts — the
# transformWithStateInPandas processor's at-rest contract: per-user
# total event count and distinct-event-type cardinality. The live
# stream keeps (ValueState total, MapState per-type) so its state is
# bounded by the type vocabulary; at rest the same answer is one
# partial-agg'd groupBy. The live test drives the processor across
# micro-batches and must converge to exactly this frame.
@register(
    "stream_tws_type_counts",
    """SELECT user_id,
       count(*) AS n_events,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
FROM events
GROUP BY user_id""",
)
def stream_tws_type_counts(spark: SparkSession, sf: str) -> DataFrame:
    from .catalog import events_table

    return (
        events_table(spark, sf)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("event_type").cast("long").alias("n_types"),
        )
    )


# ---------------------------------------------------------------------------
# SemDeDup — semantic deduplication (Abbas et al. 2023): cluster the
# embedding space coarsely, then prune within-cluster vectors whose
# cosine to an earlier (lower-id) cluster member exceeds tau. The
# clustering reuses the Lloyd-refined IVF codebook (operators/ann.py),
# so the candidate set is per-cell — never the N² corpus square: at
# 100 TB the within-cell pair count is N²/n_cells per cell on average,
# and n_cells scales with N (the serving codebook), keeping the verify
# join bucket-bounded exactly like the MinHash-LSH text path. One-pass
# lower-id keep rule (the standard streaming approximation of the
# per-cluster dedup in the paper).
_SEM_TAU = 0.35
_SEM_CELLS = 16


def _semdedup_sql() -> str:
    from ..functions.vector import duck_cosine
    from .queries_ext import _DUCK_IVF_CODEBOOK

    return f"""WITH {_DUCK_IVF_CODEBOOK},
assign AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {duck_cosine("e.embedding", "c.cvec")} DESC,
                                     c.cid DESC) AS rn
  FROM embeddings e CROSS JOIN cent c),
cells AS (SELECT vec_id, embedding, cid AS cell FROM assign WHERE rn = 1),
dups AS (
  SELECT DISTINCT b.vec_id
  FROM cells a JOIN cells b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE {duck_cosine("a.embedding", "b.embedding")} >= {_SEM_TAU})
SELECT c.vec_id, CAST(c.cell AS BIGINT) AS cell,
       (d.vec_id IS NOT NULL) AS is_dup
FROM cells c LEFT JOIN dups d ON c.vec_id = d.vec_id"""


@register("dedup_semantic", _semdedup_sql())
def dedup_semantic(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.vector import cosine_staged, l2_norm
    from ..operators.ann import ivf_assign_arrow, lloyd_refine_codebook

    emb = table(spark, sf, "embeddings")
    cents = lloyd_refine_codebook(emb, _SEM_CELLS, iters=1)
    cells = ivf_assign_arrow(emb, _SEM_CELLS, cents=cents).select(
        "vec_id", "embedding", "cell"
    )
    a = cells.select(
        F.col("cell"),
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_vec"),
        # norms staged once per side below the cell join (bit-exact
        # re-grouping — functions/vector.cosine_staged)
        l2_norm(F.col("embedding")).alias("_na"),
    )
    b = cells.select(
        F.col("cell"),
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("b_vec"),
        l2_norm(F.col("embedding")).alias("_nb"),
    )
    dups = (
        a.join(b, "cell")
        .where(F.col("a_id") < F.col("b_id"))
        .where(
            cosine_staged(
                F.col("a_vec"), F.col("b_vec"), F.col("_na"), F.col("_nb")
            )
            >= _SEM_TAU
        )
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return cells.join(dups, "vec_id", "left").select(
        "vec_id",
        F.col("cell").cast("long").alias("cell"),
        F.coalesce(F.col("_dup"), F.lit(False)).alias("is_dup"),
    )
