"""EXT queries — the LLM-data-pipeline operator surface (BASELINE.json
north star) + relational/star-schema + streaming-batch mirrors.

Conventions identical to ``queries_reference``: Spark callable paired with
a bit-exact DuckDB oracle; integer surface columns are BIGINT on both
sides; float expressions use the same cast/fold order; order-sensitive
money aggregates go through DECIMAL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vector import (
    cosine_similarity,
    cosine_staged,
    duck_cosine,
    l2_norm,
)
from ..operators import ann
from ..operators.chunking import chunk_sections
from ..operators.dedup import (
    embedding_dup_pairs,
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    lsh_verified_pairs,
    simhash16,
)
from ..operators.sectioning import assign_sections
from ..operators.similarity import knn_join
from ..operators.textstats import (
    BPE_ISH_PATTERN,
    LANG_MARKERS,
    STOPWORDS,
    fingerprints,
    language_id,
    quality_scores,
    token_counts,
)
from .catalog import events_table, register, table
from .queries_reference import _DUCK_SECTIONS, _structured

_PLANES = ann.hyperplanes()

# ---------------------------------------------------------------------------
# T3 — the recursive chunker through the real pandas_udf pipeline.
# At the correctness SF every sectioned paragraph is < 500 chars (verified:
# max 409 at sf0.01), so the 500/50 splitter is provably a strip()
# pass-through there and the oracle below is exact. Real splitting is
# exercised by `t3b_chunk_long_docs` (exact CTE oracle) and unit tests.
@register(
    "t3_chunk_pipeline",
    f"""WITH {_DUCK_SECTIONS}
SELECT doc_id, section, para_pos, CAST(0 AS BIGINT) AS chunk_pos,
       trim(paragraph) AS text
FROM content WHERE trim(paragraph) <> ''""",
)
def t3_chunk_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    content = assign_sections(_structured(table(spark, sf, "documents")))
    return chunk_sections(content).select(
        "doc_id",
        "section",
        F.col("para_pos").cast("long").alias("para_pos"),
        F.col("chunk_pos").cast("long").alias("chunk_pos"),
        "text",
    )


# T3b — real splitting (chunk_size=120 over raw text). The synthetic
# documents contain no '\n\n'/'\n'/'.', no doubled/leading/trailing
# spaces, and no word piece >= 120 chars (all three pinned for
# sf0.001/0.01/0.1 by tests/test_t3b_oracle.py — an oversized piece
# would take the splitter's append-as-is branch, outside this oracle), so
# the recursive splitter provably reduces to its single-level greedy
# word-merge scan: split on ' ' (separator attached to the start of the
# following piece), greedily fill windows of <= 120 chars, keep a
# <= 20-char tail as overlap, strip each emitted join. That scan has a
# closed form over per-doc prefix sums of piece lengths — chunk k covers
# pieces [a_k, b_k] where b_k = max e with cum(e) - cum(a_k - 1) <= 120
# and a_(k+1) = min j > a_k with cum(b_k) - cum(j-1) <= 20 and
# cum(b_k) - cum(j-1) + len(piece b_k + 1) <= 120 (or the window is
# empty) — which the oracle walks with a recursive CTE, reproducing
# every chunk byte-for-byte (pinned vs RecursiveCharacterSplitter over
# all sf0.01 docs, 1647/1647 chunks). Reference semantics:
# micro-infobot/app.py:116-126.
_T3B_ORACLE = """
WITH RECURSIVE lens AS (
  SELECT doc_id, text, i,
         CAST(length(w) + CASE WHEN i > 1 THEN 1 ELSE 0 END AS BIGINT) AS l
  FROM (SELECT doc_id, text,
               unnest(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS i
        FROM documents)
), agg AS (
  SELECT doc_id, any_value(text) AS text,
         list_prepend(CAST(0 AS BIGINT), list(cumsum ORDER BY i)) AS cum,
         max(i) AS n
  FROM (SELECT doc_id, text, i,
               CAST(sum(l) OVER (PARTITION BY doc_id ORDER BY i) AS BIGINT)
                 AS cumsum
        FROM lens)
  GROUP BY doc_id
), walk AS (
  SELECT doc_id, text, cum, n, CAST(0 AS BIGINT) AS chunk_pos,
         CAST(1 AS BIGINT) AS a,
         CAST(greatest(1, len(list_filter(cum, x -> x <= cum[1] + 120)) - 1)
              AS BIGINT) AS b
  FROM agg
  UNION ALL
  SELECT doc_id, text, cum, n, chunk_pos + 1, a2,
         CAST(greatest(a2, len(list_filter(cum,
                x -> x <= cum[CAST(a2 AS BIGINT)] + 120)) - 1) AS BIGINT)
  FROM (
    SELECT doc_id, text, cum, n, chunk_pos,
           CAST(least(greatest(
             len(list_filter(cum, x -> x < greatest(cum[b + 1] - 20,
                                                    cum[b + 2] - 120))) + 1,
             a + 1), b + 1) AS BIGINT) AS a2,
           b
    FROM walk WHERE b < n
  )
)
SELECT doc_id, chunk_pos,
       CAST(length(trim(substr(text, CAST(cum[a] + 1 AS BIGINT),
                               CAST(cum[b + 1] - cum[a] AS BIGINT))))
            AS BIGINT) AS chunk_len,
       trim(substr(text, CAST(cum[a] + 1 AS BIGINT),
                   CAST(cum[b + 1] - cum[a] AS BIGINT))) AS text
FROM walk
"""


@register("t3b_chunk_long_docs", _T3B_ORACLE)
def t3b_chunk_long_docs(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents").select(
        "doc_id", F.lit("General").alias("section"),
        F.lit(0).alias("para_pos"), "text",
    )
    chunks = chunk_sections(docs, text_col="text", chunk_size=120, chunk_overlap=20)
    return chunks.select(
        "doc_id",
        F.col("chunk_pos").cast("long").alias("chunk_pos"),
        F.length("text").cast("long").alias("chunk_len"),
        "text",
    )


# T5 — embedding hash-projection core, oracle-checked: the md5 bucket/sign
# histogram that embed_one() accumulates, exploded per (doc, bucket) with
# integer weights. A unit test pins embed_one() to this exact histogram.
_HEXPOS = "'0123456789abcdef'"


def _duck_hexval(pos: int) -> str:
    return f"(strpos({_HEXPOS}, substr(h, {pos}, 1)) - 1)"


_DUCK_IDX = (
    f"(({_duck_hexval(1)} * 16 + {_duck_hexval(2)}) "
    f"+ ({_duck_hexval(3)} * 16 + {_duck_hexval(4)}) * 256 "
    f"+ ({_duck_hexval(5)} * 16 + {_duck_hexval(6)}) * 65536 "
    f"+ ({_duck_hexval(7)} * 16 + {_duck_hexval(8)}) * 16777216) % 64"
)
_DUCK_SIGN = f"CASE WHEN {_duck_hexval(10)} % 2 = 1 THEN 1 ELSE -1 END"


@register(
    "t5_embed_histogram",
    f"""WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
hashed AS (SELECT doc_id, md5('42:' || tok) AS h FROM toks)
SELECT doc_id, CAST({_DUCK_IDX} AS BIGINT) AS bucket,
       CAST(sum({_DUCK_SIGN}) AS BIGINT) AS weight
FROM hashed GROUP BY doc_id, bucket""",
)
def t5_embed_histogram(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.dedup import spread

    toks = spread(table(spark, sf, "documents"), "doc_id").select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    h = F.md5(F.concat(F.lit("42:"), F.col("tok")))
    hexval = lambda pos: (  # noqa: E731
        F.instr(F.lit("0123456789abcdef"), F.substring(F.col("h"), pos, 1)) - 1
    )
    byte = lambda k: (  # noqa: E731
        hexval(2 * k + 1) * 16 + hexval(2 * k + 2)
    ).cast("long")
    idx = (
        byte(0) + byte(1) * 256 + byte(2) * 65536 + byte(3) * 16777216
    ) % 64
    sign = F.when(hexval(10) % 2 == 1, F.lit(1)).otherwise(F.lit(-1))
    return (
        toks.withColumn("h", h)
        .select("doc_id", idx.cast("long").alias("bucket"), sign.alias("s"))
        .groupBy("doc_id", "bucket")
        .agg(F.sum("s").cast("long").alias("weight"))
    )


# ---------------------------------------------------------------------------
# Dedup family
@register(
    "dedup_exact",
    """WITH h AS (SELECT doc_id, md5(trim(lower(text))) AS text_hash FROM documents)
SELECT doc_id, text_hash,
       min(doc_id) OVER (PARTITION BY text_hash) AS canonical_id,
       count(*) OVER (PARTITION BY text_hash) AS group_size,
       doc_id = min(doc_id) OVER (PARTITION BY text_hash) AS is_canonical
FROM h""",
)
def dedup_exact_q(spark: SparkSession, sf: str) -> DataFrame:
    return exact_dedup(table(spark, sf, "documents"))


def _duck_shingles(n: int = 2) -> str:
    gram = " || ' ' || ".join(f"ws[i+{j}]" for j in range(n))
    return f"""w AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
sh AS (
  SELECT doc_id, lang,
         unnest(list_distinct(list_transform(
           generate_series(1, len(ws) - {n - 1}), i -> {gram}))) AS shingle
  FROM w WHERE len(ws) >= {n}
)"""


_NUM_PERM, _BANDS = 8, 4
_SIG_COLS = ", ".join(
    f"min(md5('{p}:' || shingle)) AS sig_{p}" for p in range(_NUM_PERM)
)
_BAND_SELECTS = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, sig_{2*b} || sig_{2*b+1} AS key FROM sig"
    for b in range(_BANDS)
)


@register(
    "dedup_minhash_lsh",
    f"""WITH {_duck_shingles(2)},
sig AS (SELECT doc_id, {_SIG_COLS} FROM sh GROUP BY doc_id),
bands AS ({_BAND_SELECTS})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands
FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
WHERE a.doc_id < b.doc_id GROUP BY 1, 2""",
)
def dedup_minhash_lsh_q(spark: SparkSession, sf: str) -> DataFrame:
    return lsh_candidate_pairs(
        table(spark, sf, "documents"), num_perm=_NUM_PERM, bands=_BANDS
    )


_SIMHASH_SUMS = ", ".join(
    "sum(CASE WHEN CAST(floor((strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1) / {div}) AS INTEGER) % 2 = 1 "
    "THEN 1 ELSE -1 END) AS s_{j}".format(pos=j // 4 + 1, div=2 ** (j % 4), j=j)
    for j in range(16)
)
_SIMHASH_VAL = " + ".join(
    f"(CASE WHEN s_{j} > 0 THEN {2**j} ELSE 0 END)" for j in range(16)
)


@register(
    "dedup_simhash",
    f"""WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
hashed AS (SELECT doc_id, md5(w) AS h FROM words),
sums AS (SELECT doc_id, {_SIMHASH_SUMS} FROM hashed GROUP BY doc_id),
nw AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words FROM documents)
SELECT s.doc_id, CAST({_SIMHASH_VAL} AS BIGINT) AS simhash, nw.n_words
FROM sums s JOIN nw ON s.doc_id = nw.doc_id""",
)
def dedup_simhash_q(spark: SparkSession, sf: str) -> DataFrame:
    return simhash16(table(spark, sf, "documents"))


@register(
    "dedup_ngram_jaccard",
    f"""WITH {_duck_shingles(2)},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.lang = b.lang
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT doc_a, doc_b, n_common,
       CAST(n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.3""",
)
def dedup_ngram_jaccard_q(spark: SparkSession, sf: str) -> DataFrame:
    return jaccard_pairs(table(spark, sf, "documents"), threshold=0.3)


# The scale path: LSH candidates -> exact Jaccard verify of candidates only
# (work is O(candidates x shingles); the all-pairs join above is the exact
# baseline whose shingle self-join grows as sum(df(shingle)^2)).
@register(
    "dedup_lsh_verified",
    f"""WITH {_duck_shingles(2)},
sig AS (SELECT doc_id, {_SIG_COLS} FROM sh GROUP BY doc_id),
bands AS ({_BAND_SELECTS}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b)
SELECT doc_a, doc_b, n_common,
       CAST(n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.3""",
)
def dedup_lsh_verified_q(spark: SparkSession, sf: str) -> DataFrame:
    return lsh_verified_pairs(table(spark, sf, "documents"), threshold=0.3)


# Exact all-pairs cosine on a BOUNDED slice (vec_id < 512, pushed into the
# parquet scan on both sides): the N² term is capped regardless of corpus
# size, so this registered query stays runnable at any SF. Full-corpus
# near-dup goes through dedup_embedding_lsh (bucket blocking) below.
_EMB_CAP = 512


@register(
    "dedup_embedding_cosine",
    f"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {duck_cosine("a.embedding", "b.embedding")} AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE a.vec_id < {_EMB_CAP} AND b.vec_id < {_EMB_CAP}
  AND {duck_cosine("a.embedding", "b.embedding")} >= 0.35""",
)
def dedup_embedding_cosine_q(spark: SparkSession, sf: str) -> DataFrame:
    return embedding_dup_pairs(
        table(spark, sf, "embeddings"), threshold=0.35, sample_cap=_EMB_CAP
    )


# Near-dup CLUSTERS: connected components over the LSH-verified pair
# graph — an iterative algorithm (min-label propagation) whose oracle is
# a recursive CTE computing the same component minima.
@register(
    "dedup_clusters",
    f"""WITH RECURSIVE {_duck_shingles(2)},
sig AS (SELECT doc_id, {_SIG_COLS} FROM sh GROUP BY doc_id),
bands AS ({_BAND_SELECTS}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b),
pairs AS (
  SELECT doc_a, doc_b FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.3),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs),
reach(node, lbl) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT e.a, r.lbl FROM reach r JOIN edges e ON e.b = r.node)
SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node""",
)
def dedup_clusters_q(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.dedup import connected_components

    pairs = lsh_verified_pairs(table(spark, sf, "documents"), threshold=0.3)
    return connected_components(pairs)


# Embedding near-dup at scale: hyperplane-bucket blocking, then exact
# cosine only within buckets — the N² pair scan above is the exact
# baseline, this is the O(N²/buckets) path (same pattern as text LSH).
@register(
    "dedup_embedding_lsh",
    f"""WITH bucketed AS (
  SELECT vec_id, embedding, {ann.duck_bucket("embedding", _PLANES)} AS bucket
  FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {duck_cosine("a.embedding", "b.embedding")} AS cos
FROM bucketed a JOIN bucketed b
  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {duck_cosine("a.embedding", "b.embedding")} >= 0.3""",
)
def dedup_embedding_lsh_q(spark: SparkSession, sf: str) -> DataFrame:
    emb = ann.with_buckets(table(spark, sf, "embeddings"), planes=_PLANES)
    a = emb.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        "bucket",
        # norms staged once per side below the bucket join (bit-exact
        # re-grouping — functions/vector.cosine_staged)
        l2_norm(F.col("embedding")).alias("_na"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        "bucket",
        l2_norm(F.col("embedding")).alias("_nb"),
    )
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            cosine_staged(
                F.col("va"), F.col("vb"), F.col("_na"), F.col("_nb")
            ),
        )
        .where(F.col("cos") >= 0.3)
        .select("id_a", "id_b", "cos")
    )


# ---------------------------------------------------------------------------
# Similarity search
@register(
    "sim_knn_bruteforce",
    f"""WITH q AS (SELECT vec_id AS query_id, embedding AS _qvec
           FROM embeddings WHERE vec_id < 10),
s AS (SELECT q.query_id, e.vec_id, e.label,
             {duck_cosine("e.embedding", "q._qvec")} AS score
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
r AS (SELECT query_id, vec_id, label, score,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rnk
      FROM s)
SELECT query_id, vec_id, label, score, rnk FROM r WHERE rnk <= 5""",
)
def sim_knn_bruteforce_q(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = knn_join(queries, emb, k=5, exclude_same_id="vec_id")
    return out.select(
        "query_id", "vec_id", "label", "score", F.col("rnk").cast("long").alias("rnk")
    )


@register(
    "sim_lsh_bucketed",
    f"""WITH bucketed AS (
  SELECT vec_id, label, embedding, {ann.duck_bucket("embedding", _PLANES)} AS bucket
  FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS _qvec, bucket
      FROM bucketed WHERE vec_id < 10),
cand AS (
  SELECT q.query_id, b.vec_id, {duck_cosine("b.embedding", "q._qvec")} AS score
  FROM bucketed b JOIN q ON b.bucket = q.bucket
  WHERE b.vec_id <> q.query_id),
r AS (SELECT query_id, vec_id, score,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rnk
      FROM cand)
SELECT query_id, vec_id, score, rnk FROM r WHERE rnk <= 3""",
)
def sim_lsh_bucketed_q(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return ann.lsh_topk(queries, emb, k=3, planes=_PLANES)


# ---------------------------------------------------------------------------
# Text analysis
@register(
    "text_token_count",
    f"""SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS BIGINT) AS bpe_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents""",
)
def text_token_count_q(spark: SparkSession, sf: str) -> DataFrame:
    return token_counts(table(spark, sf, "documents"))


def _duck_in_list(vals: list[str]) -> str:
    return ", ".join(f"'{v}'" for v in vals)


@register(
    "text_quality_score",
    f"""WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(list_filter(string_split(text, ' '),
              w -> w IN ({_duck_in_list(STOPWORDS)}))) AS DOUBLE) AS stop_hits
  FROM documents)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       (n_chars - (n_words - 1)) / n_words AS avg_word_len,
       stop_hits / n_words AS stopword_ratio,
       0.4 * least(1.0, n_words / 100.0)
       + least(0.3, 0.3 * (stop_hits / n_words) * 3.0)
       + 0.3 * greatest(0.0, 1.0 - least(1.0, abs((n_chars - (n_words - 1)) / n_words - 5.0) / 5.0))
         AS quality
FROM t""",
)
def text_quality_score_q(spark: SparkSession, sf: str) -> DataFrame:
    return quality_scores(table(spark, sf, "documents"))


_LANGS = list(LANG_MARKERS)
_HIT_EXPRS = ", ".join(
    f"CAST(len(list_filter(ws, w -> w IN ({_duck_in_list(m)}))) AS BIGINT) AS hits_{lang}"
    for lang, m in LANG_MARKERS.items()
)
_BEST = "greatest(" + ", ".join(f"hits_{lang}" for lang in _LANGS) + ")"
_PRED = "CASE WHEN " + " WHEN ".join(
    f"hits_{lang} = {_BEST} THEN '{lang}'" for lang in _LANGS
) + " ELSE 'unk' END"


@register(
    "text_lang_id",
    f"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
h AS (SELECT doc_id, {_HIT_EXPRS} FROM w)
SELECT doc_id,
       CASE WHEN {_BEST} > 0 THEN {_PRED} ELSE 'unk' END AS pred_lang,
       {_BEST} AS best_hits
FROM h""",
)
def text_lang_id_q(spark: SparkSession, sf: str) -> DataFrame:
    return language_id(table(spark, sf, "documents"))


@register(
    "text_fingerprint",
    """SELECT doc_id, md5(lower(text)) AS fp_exact,
       md5(array_to_string(list_sort(string_split(lower(text), ' ')), ' ')) AS fp_bag
FROM documents""",
)
def text_fingerprint_q(spark: SparkSession, sf: str) -> DataFrame:
    return fingerprints(table(spark, sf, "documents"))


# ---------------------------------------------------------------------------
# Multimodal columns: binary payload metadata (decode itself is stubbed in
# sources/multimodal.py; the engine-side plumbing — binary columns + typed
# metadata — is real and exercised here).
@register(
    "mm_binary_meta",
    """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha, source
FROM documents""",
)
def mm_binary_meta_q(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
        F.sha2(F.col("text"), 256).alias("sha"),
        "source",
    )


# ---------------------------------------------------------------------------
# Relational / star-schema (exercises joins, aggs, windows, rollup, set ops)
@register(
    "rel_q1_pricing",
    """SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,8))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(24,8))) AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus""",
)
def rel_q1_pricing(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    dec_qty = F.col("l_quantity").cast("decimal(18,2)")
    dec_price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(24,8)"
    )
    charge = (
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
    ).cast("decimal(24,8)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec_qty).cast("double").alias("sum_qty"),
        F.sum(dec_price).cast("double").alias("sum_base_price"),
        F.sum(disc).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        (F.sum(dec_qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "rel_q3_shipping",
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,8))) AS DOUBLE) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10""",
)
def rel_q3_shipping(spark: SparkSession, sf: str) -> DataFrame:
    cust = table(spark, sf, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(24,8)"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "rel_q5_region_revenue",
    """SELECT r_name, n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,8))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name""",
)
def rel_q5_region_revenue(spark: SparkSession, sf: str) -> DataFrame:
    cust = table(spark, sf, "customer")
    orders = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem")
    supp = table(spark, sf, "supplier")
    nation = table(spark, sf, "nation")
    region = table(spark, sf, "region")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(24,8)"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "rel_window_running",
    # ORDER BY totality (r10 sf0.1 catch): the fixture's
    # (l_orderkey, l_linenumber) is NOT unique — sf0.1 carries 261k
    # duplicate pairs and TWO rows duplicating the full
    # (suppkey, shipdate, orderkey, linenumber) sort key, so a running
    # sum ordered only by those columns is genuinely order-dependent
    # (engines split nondeterministically: 1/600k rows, off by one
    # quantity). l_quantity joins the ORDER BY on both engines; any
    # remaining full ties then carry EQUAL quantity, which makes the
    # output multiset permutation-invariant (the hash gate compares
    # sorted rows, so multiset determinism is the contract).
    """SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
            OVER (PARTITION BY l_suppkey
                  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
FROM lineitem""",
)
def rel_window_running(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return table(spark, sf, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_qty"),
    )


@register(
    "rel_rollup_orders",
    """SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""",
)
def rel_rollup_orders(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@register(
    "rel_cube_events",
    """WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events)
SELECT event_type, CAST(user_id % 10 AS BIGINT) AS user_bucket,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM ev GROUP BY CUBE (event_type, CAST(user_id % 10 AS BIGINT))""",
)
def rel_cube_events(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf).withColumn(
        "user_bucket", (F.col("user_id") % 10).cast("long")
    )
    return ev.cube("event_type", "user_bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
    )


@register(
    "rel_set_ops",
    """SELECT 'both' AS tag, custkey FROM (
  SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
  INTERSECT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
UNION ALL
SELECT 'open_only' AS tag, custkey FROM (
  SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
  EXCEPT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')""",
)
def rel_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    orders = table(spark, sf, "orders")
    o = orders.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    ).distinct()
    f = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    ).distinct()
    both = o.intersect(f).select(F.lit("both").alias("tag"), "custkey")
    only = o.exceptAll(f).select(F.lit("open_only").alias("tag"), "custkey")
    return both.unionByName(only)


@register(
    "rel_join_family",
    """SELECT
  (SELECT count(*) FROM customer JOIN orders ON c_custkey = o_custkey) AS n_inner,
  (SELECT count(*) FROM customer c LEFT JOIN orders o ON c_custkey = o_custkey
   WHERE o_orderkey IS NULL) AS n_no_orders,
  (SELECT count(*) FROM customer c WHERE EXISTS
     (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_semi,
  (SELECT count(*) FROM customer c WHERE NOT EXISTS
     (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_anti""",
)
def rel_join_family(spark: SparkSession, sf: str) -> DataFrame:
    # all four join flavors read off ONE left join in a single agg pass:
    # matched-pair count = inner, unmatched left rows = anti (= customers
    # with no orders), distinct matched keys = semi — one shuffle instead
    # of four joins chained by crossJoins
    cust = table(spark, sf, "customer")
    orders = table(spark, sf, "orders")
    j = cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
    unmatched = F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)
    return j.agg(
        F.count("o_orderkey").alias("n_inner"),
        F.sum(unmatched).cast("long").alias("n_no_orders"),
        F.countDistinct(
            F.when(F.col("o_orderkey").isNotNull(), F.col("c_custkey"))
        ).alias("n_semi"),
        F.sum(unmatched).cast("long").alias("n_anti"),
    )


# As-of join: for each purchase event, the user's most recent prior
# (or same-instant) non-purchase event. Right side deduped to one row
# per (user, ts) so tie-resolution is well-defined on both engines.
@register(
    "rel_asof_join",
    """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events),
l AS (SELECT event_id, ts, user_id, value FROM ev WHERE event_type = 'purchase'),
r0 AS (SELECT user_id, ts, max(event_id) AS r_event_id
       FROM ev WHERE event_type <> 'purchase' GROUP BY user_id, ts)
SELECT l.event_id, l.user_id, l.value,
       r0.r_event_id AS matched_event_id,
       CAST(epoch_us(l.ts - r0.ts) AS BIGINT) AS lag_us
FROM l ASOF LEFT JOIN r0 ON l.user_id = r0.user_id AND l.ts >= r0.ts""",
)
def rel_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = events_table(spark, sf)
    left = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    right = (
        ev.where(F.col("event_type") != "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("r_event_id"))
    )
    joined = asof_join(left, right, on="user_id", right_cols=["r_event_id"])
    return joined.select(
        "event_id",
        "user_id",
        "value",
        F.col("r_event_id_right").alias("matched_event_id"),
        (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts_right"))
        ).alias("lag_us"),
    )


# Range join: purchases paired with every same-user event in the
# trailing 30 minutes. Spark side uses the bucketized equi-join rewrite
# (rangejoin.py); the oracle states the raw inequality join.
@register(
    "rel_range_join",
    """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events),
l AS (SELECT event_id, ts, user_id FROM ev WHERE event_type = 'purchase'),
r AS (SELECT event_id AS r_event_id, ts AS r_ts, user_id, event_type AS r_type
      FROM ev WHERE event_type <> 'purchase')
SELECT l.event_id, l.user_id, r.r_event_id, r.r_type,
       CAST(epoch_us(l.ts - r.r_ts) AS BIGINT) AS lag_us
FROM l JOIN r ON l.user_id = r.user_id
             AND r.r_ts <= l.ts
             AND r.r_ts >= l.ts - INTERVAL 30 MINUTE""",
)
def rel_range_join(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.rangejoin import range_join_recent

    ev = events_table(spark, sf)
    left = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id"
    )
    right = ev.where(F.col("event_type") != "purchase").select(
        F.col("event_id").alias("r_event_id"),
        F.col("ts").alias("r_ts"),
        "user_id",
        F.col("event_type").alias("r_type"),
    )
    joined = range_join_recent(
        left, right, on="user_id", window_seconds=1800,
        left_ts="ts", right_ts="r_ts",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("r_event_id_right").alias("r_event_id"),
        F.col("r_type_right").alias("r_type"),
        (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("r_ts_right"))
        ).alias("lag_us"),
    )


# Multi-granularity rollup (hypertable-style continuous aggregate):
# GROUPING SETS over (day) and (day, hour) in one pass.
@register(
    "stream_multi_rollup",
    """WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events)
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CASE WHEN GROUPING(date_trunc('hour', ts)) = 0
            THEN CAST(date_trunc('hour', ts) AS TIMESTAMP) END AS hour,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM ev
GROUP BY GROUPING SETS ((date_trunc('day', ts)), (date_trunc('day', ts), date_trunc('hour', ts)))""",
)
def stream_multi_rollup(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf).select(
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        "value",
    )
    return (
        ev.groupingSets(
            [["day"], ["day", "hour"]], "day", "hour"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select("day", "hour", "n_events", "sum_value")
    )


# Window-function battery: lead/lag/ntile/first/last/rank/dense_rank
@register(
    "rel_window_family",
    """SELECT l_suppkey, l_orderkey, l_linenumber,
       lag(l_quantity) OVER w AS prev_qty,
       lead(l_quantity) OVER w AS next_qty,
       first_value(l_quantity) OVER w AS first_qty,
       last_value(l_quantity) OVER (PARTITION BY l_suppkey
                                    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_qty,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       CAST(rank() OVER (PARTITION BY l_suppkey ORDER BY l_quantity) AS BIGINT) AS qty_rank,
       CAST(dense_rank() OVER (PARTITION BY l_suppkey ORDER BY l_quantity) AS BIGINT) AS qty_dense_rank
FROM lineitem
WINDOW w AS (PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity)""",
)
def rel_window_family(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    # l_quantity tiebreak: see rel_window_running (r10 sf0.1 catch) —
    # lag/lead/ntile over a non-total order were order-dependent on the
    # full-key-duplicate rows; with equal-quantity ties the output
    # multiset is permutation-invariant
    w = Window.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wq = Window.partitionBy("l_suppkey").orderBy("l_quantity")
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.lag("l_quantity").over(w).alias("prev_qty"),
        F.lead("l_quantity").over(w).alias("next_qty"),
        F.first("l_quantity").over(w).alias("first_qty"),
        F.last("l_quantity").over(wfull).alias("last_qty"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.rank().over(wq).cast("long").alias("qty_rank"),
        F.dense_rank().over(wq).cast("long").alias("qty_dense_rank"),
    )


# Exact interpolated percentiles per group (DuckDB quantile_cont mirror)
@register(
    "rel_percentiles",
    """SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS p50_qty,
       quantile_cont(l_quantity, 0.9) AS p90_qty,
       quantile_cont(l_extendedprice, 0.5) AS p50_price
FROM lineitem GROUP BY l_returnflag""",
)
def rel_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("p50_qty"),
        F.percentile("l_quantity", F.lit(0.9)).alias("p90_qty"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("p50_price"),
    )


# Levenshtein edit-distance pairs (string-similarity scalar; bounded
# block). Distance is over the ASCII PROJECTION of the 30-codepoint
# prefix (every non-ASCII codepoint → '?'): Spark's levenshtein counts
# codepoints but DuckDB's counts UTF-8 BYTES, so raw non-ASCII text
# diverges between the engines (parity_fuzz edge profile; 'café' vs
# 'cafe' is 1 to Spark, 2 to DuckDB). The projection makes bytes ==
# codepoints, turning the oracle exact on ALL data — and both regex
# engines treat supplementary codepoints (emoji) as ONE class match.
@register(
    "text_edit_distance",
    r"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(
         regexp_replace(substring(a.text, 1, 30), '[^\x00-\x7F]', '?', 'g'),
         regexp_replace(substring(b.text, 1, 30), '[^\x00-\x7F]', '?', 'g')
       ) AS BIGINT) AS dist
FROM documents a JOIN documents b
  ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE a.doc_id < 25 AND b.doc_id < 25""",
)
def text_edit_distance(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents").where(F.col("doc_id") < 25)

    def _ascii30(col: str):
        return F.regexp_replace(
            F.substring(col, 1, 30), r"[^\x00-\x7F]", "?"
        )

    a = docs.select(
        F.col("doc_id").alias("doc_a"),
        "lang",
        _ascii30("text").alias("ta"),
    )
    b = docs.select(
        F.col("doc_id").alias("doc_b"),
        "lang",
        _ascii30("text").alias("tb"),
    )
    return (
        a.join(b, "lang")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("ta", "tb").cast("long").alias("dist"),
        )
    )


# Conversion funnel: per user, first view -> first subsequent purchase
@register(
    "stream_funnel",
    """WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events),
v AS (SELECT user_id, min(ts) AS first_view FROM ev WHERE event_type = 'view' GROUP BY user_id),
p AS (SELECT e.user_id, min(e.ts) AS first_purchase
      FROM ev e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts > v.first_view
      GROUP BY e.user_id)
SELECT v.user_id, v.first_view, p.first_purchase,
       p.first_purchase IS NOT NULL AS converted,
       CAST(epoch_us(p.first_purchase - v.first_view) AS BIGINT) AS us_to_convert
FROM v LEFT JOIN p ON v.user_id = p.user_id""",
)
def stream_funnel(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        v.join(p, "user_id", "left")
        .select(
            "user_id",
            "first_view",
            "first_purchase",
            F.col("first_purchase").isNotNull().alias("converted"),
            (
                F.unix_micros("first_purchase") - F.unix_micros("first_view")
            ).alias("us_to_convert"),
        )
    )


# ---------------------------------------------------------------------------
# Streaming-batch mirrors (the same aggregations the streaming module runs
# with readStream — here executed batch so the oracle can check them)
@register(
    "stream_tumbling_1h",
    """WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events)
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM ev GROUP BY 1, 2""",
)
def stream_tumbling_1h(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "stream_session_windows",
    """WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, user_id FROM events),
flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR epoch(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 43200
              THEN 1 ELSE 0 END AS new_session
  FROM ev),
islands AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM islands GROUP BY user_id, session_id""",
)
def stream_session_windows(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf)
    return (
        ev.groupBy(F.session_window("ts", "12 hours").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n_events"
        )
    )


# §2.9c — watermark / late-data DROP RULE, batch-mirrored so DuckDB can
# check it (VERDICT r1 item 7; the live-stream behavior itself is pinned
# by tests/test_streaming.py). Arrival order = event_id; after each
# arrival the watermark is max(event time so far) - 1h, and a row is late
# iff its event time is behind the watermark established by its
# predecessors — the per-row form of Structured Streaming's drop rule
# (one-row micro-batches). The global arrival-order window exists ONLY in
# this mirror: the streaming runtime tracks the watermark as scan state,
# no sort anywhere.
@register(
    "stream_watermark_drop",
    """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
wm AS (
  SELECT event_id, ts,
         max(ts) OVER (ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_prev
  FROM ev),
flagged AS (
  SELECT ts,
         (max_prev IS NOT NULL AND ts < max_prev - INTERVAL 1 HOUR) AS late
  FROM wm)
SELECT date_trunc('hour', ts) AS window_start,
       count(*) AS n_events,
       CAST(sum(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(sum(CASE WHEN NOT late THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM flagged GROUP BY 1""",
)
def stream_watermark_drop(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_table(spark, sf).select("event_id", "ts")
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, -1)
    flagged = ev.withColumn("max_prev", F.max("ts").over(w)).withColumn(
        "late",
        F.col("max_prev").isNotNull()
        & (F.col("ts") < F.col("max_prev") - F.expr("INTERVAL 1 HOUR")),
    )
    return (
        flagged.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("late"), 1).otherwise(0)).cast("long").alias("n_late"),
            F.sum(F.when(~F.col("late"), 1).otherwise(0)).cast("long").alias("n_kept"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "n_late", "n_kept")
    )


# §2.9d — incremental index ≡ full rebuild (VERDICT r1 item 7): the
# foreachBatch upsert in streaming/ingest.py appends per-batch E1 output;
# that is only correct because the pipeline is per-document (sectioning
# windows partition by doc_id), so index(base ∪ delta) = index(base) ∪
# index(delta). This query RUNS both sides — chunks built from a base/
# delta split and unioned, vs one full build — and emits the per-section
# comparison; `match` must be true on every row.
@register(
    "stream_incremental_index",
    f"""WITH {_DUCK_SECTIONS},
chunks AS (
  SELECT doc_id, section, trim(paragraph) AS text FROM content
  WHERE trim(paragraph) <> ''),
inc AS (
  SELECT * FROM chunks WHERE doc_id % 5 <> 0
  UNION ALL
  SELECT * FROM chunks WHERE doc_id % 5 = 0),
inc_agg AS (
  SELECT section, count(*) AS n_inc,
         CAST(sum(length(text)) AS BIGINT) AS len_inc
  FROM inc GROUP BY section),
full_agg AS (
  SELECT section, count(*) AS n_full,
         CAST(sum(length(text)) AS BIGINT) AS len_full
  FROM chunks GROUP BY section)
SELECT i.section, n_inc, n_full, len_inc, len_full,
       (n_inc = n_full AND len_inc = len_full) AS match
FROM inc_agg i JOIN full_agg f ON i.section = f.section""",
)
def stream_incremental_index(spark: SparkSession, sf: str) -> DataFrame:
    docs = _structured(table(spark, sf, "documents"))
    base = docs.where(F.col("doc_id") % 5 != 0)
    delta = docs.where(F.col("doc_id") % 5 == 0)

    def chunks_of(d: DataFrame) -> DataFrame:
        c = chunk_sections(assign_sections(d))
        return c.where(F.col("text") != "").select("doc_id", "section", "text")

    inc = chunks_of(base).unionByName(chunks_of(delta))
    full = chunks_of(docs)
    inc_agg = inc.groupBy("section").agg(
        F.count(F.lit(1)).alias("n_inc"),
        F.sum(F.length("text")).cast("long").alias("len_inc"),
    )
    full_agg = full.groupBy("section").agg(
        F.count(F.lit(1)).alias("n_full"),
        F.sum(F.length("text")).cast("long").alias("len_full"),
    )
    return inc_agg.join(full_agg, "section").select(
        "section",
        "n_inc",
        "n_full",
        "len_inc",
        "len_full",
        ((F.col("n_inc") == F.col("n_full")) & (F.col("len_inc") == F.col("len_full"))).alias("match"),
    )


# IVF-flat ANN (the third ANN family next to hyperplane-LSH and MLlib
# BRP-LSH): seeded codebook (vec_id < 16) sharpened by ONE Lloyd's pass —
# centroid update = element-wise mean of assigned vectors' int8 codes, so
# the refinement is exact integer arithmetic and bit-identical on both
# engines (a float mean would be shuffle-order-dependent). Then map-only
# cell assignment (argmax over literal centroids — zero shuffle), nprobe=4
# probing, exact cosine rerank, TakeOrderedAndProject top-5. The oracle
# replays seed-assign → code-mean update → assign → probe → rerank with
# the same tie-breaks (max-struct ≡ ORDER BY score DESC, cid DESC).
_IVF_N, _IVF_QID, _IVF_NPROBE, _IVF_K = 16, 7, 4, 5

from ..functions.vector import duck_abs_max, duck_quantize_i8  # noqa: E402

_DUCK_IVF_CODEBOOK = f"""seed AS (
  SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < {_IVF_N}),
a0 AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {duck_cosine("e.embedding", "c.cvec")} DESC,
                                     c.cid DESC) AS rn
  FROM embeddings e CROSS JOIN seed c),
cells0 AS (SELECT vec_id, embedding, cid AS cell FROM a0 WHERE rn = 1),
qcodes AS (
  SELECT cell,
         unnest(generate_series(0, len(embedding) - 1)) AS i,
         unnest({duck_quantize_i8("embedding", duck_abs_max("embedding"))}) AS code
  FROM cells0),
cdims AS (
  SELECT cell, i, CAST(sum(code) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS c
  FROM qcodes GROUP BY cell, i),
cent AS (SELECT cell AS cid, list(c ORDER BY i) AS cvec FROM cdims GROUP BY cell)"""


@register(
    "sim_ivf_topk",
    f"""WITH {_DUCK_IVF_CODEBOOK},
assign AS (
  SELECT e.vec_id, e.label, e.embedding, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {duck_cosine("e.embedding", "c.cvec")} DESC,
                                     c.cid DESC) AS rn
  FROM embeddings e CROSS JOIN cent c),
cells AS (SELECT vec_id, label, embedding, cid AS cell FROM assign WHERE rn = 1),
q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = {_IVF_QID}),
qc AS (SELECT c.cid FROM cent c, q
       ORDER BY {duck_cosine("c.cvec", "q.qvec")} DESC, c.cid DESC LIMIT {_IVF_NPROBE}),
scored AS (
  SELECT ce.vec_id, ce.label, {duck_cosine("ce.embedding", "q.qvec")} AS score
  FROM cells ce, q WHERE ce.cell IN (SELECT cid FROM qc)),
ranked AS (
  SELECT vec_id, label, score,
         row_number() OVER (ORDER BY score DESC, vec_id) AS rnk
  FROM scored)
SELECT vec_id, label, score, rnk FROM ranked WHERE rnk <= {_IVF_K}""",
)
def sim_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    return ann.ivf_topk(
        table(spark, sf, "embeddings"),
        query_id=_IVF_QID,
        k=_IVF_K,
        nprobe=_IVF_NPROBE,
        n_centroids=_IVF_N,
        refine_iters=1,
    )


# Multimodal frame-sampling plan (SURVEY EXT): media rows derived from
# document bytes (doc_id%3==0 → video), stub metadata (duration from
# md5 bytes 2..3, little-endian) → one row per (media_id, frame_ts_ms)
# at 1 fps. The explode shape IS the contract a real decoder plugs into;
# the oracle replays the md5 arithmetic (floor-div mirrors Spark's
# double→int truncation — DuckDB CAST alone would round).
_B2 = f"({_duck_hexval(5)} * 16 + {_duck_hexval(6)})"
_B3 = f"({_duck_hexval(7)} * 16 + {_duck_hexval(8)})"


@register(
    "mm_frame_plan",
    f"""WITH m AS (
  SELECT doc_id AS media_id, md5(text) AS h FROM documents WHERE doc_id % 3 = 0),
d AS (
  SELECT media_id, 1000 + ({_B2} + 256 * {_B3}) AS duration_ms FROM m)
SELECT media_id,
       CAST(unnest(generate_series(0, CAST(floor(duration_ms / 1000.0) AS INT))) * 1000 AS BIGINT) AS frame_ts_ms
FROM d""",
)
def mm_frame_plan(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.multimodal import frame_sample_plan, synth_media_from_docs

    docs = table(spark, sf, "documents")
    # content is a VALID AVI (media_headers.build_avi) whose header
    # carries the md5-derived duration; the plan's duration comes from
    # the tier-2 header PARSE, which the oracle's md5 arithmetic
    # certifies (a tier-3 fake would md5 the AVI bytes and diverge)
    media = synth_media_from_docs(
        docs.where(F.col("doc_id") % 3 == 0).select(
            F.col("doc_id").alias("media_id"),
            F.lit("video").alias("kind"),
            "text",
        )
    )
    return frame_sample_plan(media, every_ms=1000).select(
        "media_id", F.col("frame_ts_ms").cast("long").alias("frame_ts_ms")
    )


# TPC-H Q10 shape — returned-items revenue per customer (broadcast dim
# joins, pushed-down returnflag + orderdate range, decimal-exact money).
@register(
    "rel_q10_returned",
    """SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,8))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20""",
)
def rel_q10_returned(spark: SparkSession, sf: str) -> DataFrame:
    cust = table(spark, sf, "customer")
    orders = table(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf, "lineitem").where(F.col("l_returnflag") == "R")
    nat = table(spark, sf, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(24,8)"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# TPC-H Q14 shape — promo revenue share over a shipdate year: part is
# broadcast (first catalog use of the part table), both sums decimal-
# exact, the final ratio computed identically in double on both engines.
@register(
    "rel_q14_promo_share",
    """SELECT
  CAST(sum(CASE WHEN p_type = 'PROMO'
       THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,8))
       ELSE CAST(0 AS DECIMAL(24,8)) END) AS DOUBLE) * 100.0
  / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,8))) AS DOUBLE)
    AS promo_pct,
  count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_shipdate < TIMESTAMP '1999-01-01'""",
)
def rel_q14_promo_share(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    part = table(spark, sf, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(24,8)"
    )
    zero = F.lit(0).cast("decimal(24,8)")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        (
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast(
                "double"
            )
            * 100.0
            / F.sum(rev).cast("double")
        ).alias("promo_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


# Skew-safe aggregation through operators/skew.py::two_phase_agg — the
# hot-key rewrite (salt → partial → final) must be value-identical to the
# plain GROUP BY; decimal sums make the equality exact regardless of
# addition order, so the oracle is the plain aggregation.
@register(
    "skew_salted_agg",
    """WITH ev AS (SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v FROM events)
SELECT event_type, CAST(sum(v) AS DOUBLE) AS total
FROM ev GROUP BY event_type""",
)
def skew_salted_agg(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.skew import two_phase_agg

    ev = events_table(spark, sf).select(
        "event_type", F.col("value").cast("decimal(18,2)").alias("v")
    )
    return two_phase_agg(ev, "event_type", "v", salt_buckets=16).select(
        "event_type", F.col("total").cast("double").alias("total")
    )


# Multimodal resize plan: aspect-preserving output dims from the stub
# metadata (width/height from md5 bytes 0/1), long side → 224. The
# oracle replays the md5 arithmetic; floor(x*224/g) mirrors exactly.
_B0 = f"({_duck_hexval(1)} * 16 + {_duck_hexval(2)})"
_B1 = f"({_duck_hexval(3)} * 16 + {_duck_hexval(4)})"


@register(
    "mm_resize_plan",
    f"""WITH m AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'video' ELSE 'image' END AS kind,
         md5(text) AS h
  FROM documents WHERE doc_id % 3 <> 2),
dims AS (
  SELECT media_id, kind,
         CAST(64 + {_B0} % 192 AS INT) AS width,
         CAST(64 + {_B1} % 192 AS INT) AS height
  FROM m),
g AS (SELECT *, CAST(greatest(width, height) AS DOUBLE) AS long_side FROM dims)
SELECT media_id, kind, width, height,
       CAST(floor(width * 224 / long_side) AS INT) AS out_w,
       CAST(floor(height * 224 / long_side) AS INT) AS out_h,
       224.0 / long_side AS scale
FROM g""",
)
def mm_resize_plan(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.multimodal import resize_plan, synth_media_from_docs

    docs = table(spark, sf, "documents").where(F.col("doc_id") % 3 != 2)
    # valid BMP (image) / AVI (video) payloads whose headers carry the
    # md5-derived dims; the resize math consumes the tier-2 header
    # PARSE, oracle-certified by the md5 arithmetic
    media = synth_media_from_docs(
        docs.select(
            F.col("doc_id").alias("media_id"),
            F.when(F.col("doc_id") % 3 == 0, "video")
            .otherwise("image")
            .alias("kind"),
            "text",
        )
    )
    return resize_plan(media, target=224)


# S6 — per-user transcript reconstruction (ConversationBufferMemory,
# app.py:43-44) through sinks.session_transcripts, driven by a
# deterministic chat history derived from events: message=event_type,
# response=props, tokens from floor(value)/len(props). Messages exploded
# to rows so the oracle compares scalars.
@register(
    "s6_transcript_reconstruct",
    """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events),
chat AS (
  SELECT user_id AS usr, event_type AS message, props AS response, ts,
         CAST(floor(value) AS BIGINT) AS ptok,
         CAST(length(props) AS BIGINT) AS ctok
  FROM ev),
ordered AS (
  SELECT *, row_number() OVER (PARTITION BY usr ORDER BY ts, message, response) - 1 AS turn
  FROM chat),
totals AS (
  SELECT usr, count(*) AS n_turns,
         CAST(sum(ptok) AS BIGINT) AS prompt_tokens,
         CAST(sum(ctok) AS BIGINT) AS completion_tokens,
         CAST(sum(ptok) AS DOUBLE) * 0.00001 + CAST(sum(ctok) AS DOUBLE) * 0.00003 AS cost_usd
  FROM chat GROUP BY usr),
msgs AS (
  SELECT usr, turn * 2 AS pos, 'user' AS role, message AS content FROM ordered
  UNION ALL
  SELECT usr, turn * 2 + 1, 'assistant', response FROM ordered)
SELECT m.usr AS chat_user, CAST(m.pos AS BIGINT) AS msg_pos, m.role, m.content,
       t.n_turns, t.prompt_tokens, t.completion_tokens, t.cost_usd
FROM msgs m JOIN totals t ON m.usr = t.usr""",
)
def s6_transcript_reconstruct(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.sinks import session_transcripts

    ev = events_table(spark, sf)
    chat = ev.select(
        F.col("user_id").alias("user"),
        F.col("event_type").alias("message"),
        F.col("props").alias("response"),
        "ts",
        F.floor("value").cast("long").alias("prompt_tokens"),
        F.length("props").cast("long").alias("completion_tokens"),
    )
    tr = session_transcripts(chat)
    return tr.select(
        F.col("user").alias("chat_user"),
        F.posexplode("messages").alias("msg_pos", "m"),
        "n_turns",
        "prompt_tokens",
        "completion_tokens",
        "cost_usd",
    ).select(
        "chat_user",
        F.col("msg_pos").cast("long").alias("msg_pos"),
        F.col("m.role").alias("role"),
        F.col("m.content").alias("content"),
        "n_turns",
        "prompt_tokens",
        "completion_tokens",
        "cost_usd",
    )


# Stream-stream interval join, batch-mirrored (the live path is
# streaming/chat_stream.py::interval_join, exercised in
# tests/test_streaming.py): per purchase, the same user's views in the
# trailing hour — aggregated per purchase so the result stays bounded.
@register(
    "stream_interval_join",
    """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events),
v AS (SELECT user_id, ts AS v_ts, event_id AS view_id FROM ev WHERE event_type = 'view'),
p AS (SELECT user_id, ts AS p_ts, event_id AS purchase_id FROM ev WHERE event_type = 'purchase'),
j AS (
  SELECT p.user_id, p.purchase_id, v.view_id
  FROM p JOIN v ON v.user_id = p.user_id
   AND v.v_ts <= p.p_ts AND v.v_ts >= p.p_ts - INTERVAL 1 HOUR)
SELECT user_id, purchase_id, count(*) AS n_views,
       CAST(min(view_id) AS BIGINT) AS first_view_id
FROM j GROUP BY user_id, purchase_id""",
)
def stream_interval_join(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.chat_stream import interval_join

    ev = events_table(spark, sf)
    views = ev.where(F.col("event_type") == "view")
    buys = ev.where(F.col("event_type") == "purchase")
    joined = interval_join(views, buys)  # watermark is a no-op in batch
    return joined.groupBy("user_id", "purchase_id").agg(
        F.count(F.lit(1)).alias("n_views"),
        F.min("view_id").cast("long").alias("first_view_id"),
    )


# ---------------------------------------------------------------------------
# sim_quantized_topk — int8 scalar-quantized retrieval: the 4× memory /
# IO compression used by billion-vector stores. Quantized dot products are
# exact INTEGER arithmetic (no float fold-order concerns); only the final
# per-pair rescale multiplies doubles, so cross-engine parity is bit-exact.
# Recall vs the exact path is pinned by a unit test (error bound), not by
# this oracle (which checks the quantized computation itself).
from ..functions.vector import (  # noqa: E402
    abs_max,
    duck_abs_max,
    duck_int_dot,
    duck_quantize_i8,
    int_dot,
    quantize_i8,
)


@register(
    "sim_quantized_topk",
    f"""WITH e AS (
  SELECT vec_id, embedding, {duck_abs_max("embedding")} AS m FROM embeddings),
q8 AS (
  SELECT vec_id, m, {duck_quantize_i8("embedding", "m")} AS q FROM e),
qs AS (SELECT vec_id AS query_id, m AS qm, q AS qq FROM q8 WHERE vec_id < 10),
sc AS (
  SELECT s.query_id, e.vec_id,
         CAST({duck_int_dot("e.q", "s.qq")} AS DOUBLE)
         * (e.m / 127.0) * (s.qm / 127.0) AS approx_dot
  FROM q8 e CROSS JOIN qs s WHERE e.vec_id <> s.query_id),
ranked AS (
  SELECT query_id, vec_id, approx_dot,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY approx_dot DESC, vec_id) AS rnk
  FROM sc)
SELECT query_id, vec_id, CAST(rnk AS BIGINT) AS rnk, approx_dot
FROM ranked WHERE rnk <= 5""",
)
def sim_quantized_topk_q(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings")
    q8 = emb.select(
        "vec_id",
        abs_max(F.col("embedding")).alias("m"),  # zero-guard folded in
        "embedding",
    ).select(
        "vec_id", "m",
        quantize_i8(F.col("embedding"), F.col("m")).alias("q"),
    )
    qs = q8.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("m").alias("qm"),
        F.col("q").alias("qq"),
    )
    scored = (
        q8.crossJoin(F.broadcast(qs))
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "approx_dot",
            int_dot(F.col("q"), F.col("qq")).cast("double")
            * (F.col("m") / 127.0)
            * (F.col("qm") / 127.0),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_dot"), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 5)
        .select("query_id", "vec_id", "rnk", "approx_dot")
    )


# ---------------------------------------------------------------------------
# sim_ivf_quantized — the composition that actually ships at scale: IVF
# cell pruning (nprobe/n_centroids of the data touched) over int8 codes
# (4× less IO inside the probed cells). sim_quantized_topk above is the
# compressed-SCAN baseline; this is the pruned path. Shares the Lloyd-
# refined codebook CTE with sim_ivf_topk, so the oracle replays codebook →
# assign → quantize → probe → integer-dot rank end-to-end.
@register(
    "sim_ivf_quantized",
    f"""WITH {_DUCK_IVF_CODEBOOK},
assign AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {duck_cosine("e.embedding", "c.cvec")} DESC,
                                     c.cid DESC) AS rn
  FROM embeddings e CROSS JOIN cent c),
cells AS (SELECT vec_id, embedding, cid AS cell FROM assign WHERE rn = 1),
e8 AS (
  SELECT vec_id, cell, embedding,
         {duck_abs_max("embedding")} AS m,
         {duck_quantize_i8("embedding", duck_abs_max("embedding"))} AS q
  FROM cells),
qs AS (SELECT vec_id AS query_id, embedding AS qvec, m AS qm, q AS qq
       FROM e8 WHERE vec_id < 10),
probe AS (
  SELECT s.query_id, c.cid,
         row_number() OVER (PARTITION BY s.query_id
                            ORDER BY {duck_cosine("c.cvec", "s.qvec")} DESC,
                                     c.cid DESC) AS prn
  FROM qs s CROSS JOIN cent c),
sc AS (
  SELECT s.query_id, e.vec_id,
         CAST({duck_int_dot("e.q", "s.qq")} AS DOUBLE)
         * (e.m / 127.0) * (s.qm / 127.0) AS approx_dot
  FROM e8 e, qs s, (SELECT query_id, cid FROM probe WHERE prn <= 4) p
  WHERE p.query_id = s.query_id AND p.cid = e.cell
    AND e.vec_id <> s.query_id),
ranked AS (
  SELECT query_id, vec_id, approx_dot,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY approx_dot DESC, vec_id) AS rnk
  FROM sc)
SELECT query_id, vec_id, CAST(rnk AS BIGINT) AS rnk, approx_dot
FROM ranked WHERE rnk <= 5""",
)
def sim_ivf_quantized(spark: SparkSession, sf: str) -> DataFrame:
    return ann.ivf_quantized_topk(
        table(spark, sf, "embeddings"),
        query_max_id=10,
        k=5,
        nprobe=_IVF_NPROBE,
        n_centroids=_IVF_N,
        refine_iters=1,
    )
