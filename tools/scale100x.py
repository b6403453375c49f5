"""One-off 100× dedup scale experiment (recorded in docs/SCALING.md).

Extends the bench's 10× evidence one more decade: 500,000 docs arranged
as 50,000 near-dup families of 10. The design point is CONSTANT
duplicate density — the 10× bench corpus scales replicas-per-doc (its
families grow with SF), which makes verify cost grow with density², not
corpus. Here family count scales and family size stays 10, so a linear
signature stage plus output-sensitive verify should land ~10× the
50k-doc numbers — the same slope a 1000-executor cluster needs.

Corpus construction (all Catalyst, deterministic, no RNG):
- 100 replicas per sf0.1 doc; family = (doc_id, r // 10), 10 docs each.
- Every OTHER word is salted with the family hash: shingle_n=2, so
  every 2-word shingle contains a salted word → ZERO shared shingles
  across families (even families sharing a base doc), while replicas
  within a family share all salted text (jaccard ≈ 0.93 over the
  trailing replica marker). Cross-family candidate rate is the md5
  band-collision floor, i.e. ~0.

Usage: python tools/scale100x.py            (prints one JSON line)
Cached corpus: /tmp/ade_scale100x (rebuild: delete the dir).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ade_agente_documental_empresarial___miner_a_spark.operators.dedup import (  # noqa: E402
    connected_components,
    lsh_verified_pairs,
)
from ade_agente_documental_empresarial___miner_a_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/ade_scale100x"
REPLICAS = 100
FAM_SIZE = 10


def ensure_corpus(spark) -> str:
    path = os.path.join(OUT, "documents.parquet")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    # rename the input id BEFORE deriving salts: the output select list
    # re-aliases `doc_id`, and Spark's lateral column alias resolution
    # binds a later `F.col("doc_id")` in the same select to that NEW
    # alias — which silently made fam unique per row (0 dup pairs) in
    # the first version of this script
    docs = spark.read.parquet(
        os.path.join(SF_DIR, "documents.parquet")
    ).withColumnRenamed("doc_id", "src_id")
    reps = spark.range(REPLICAS).select(F.col("id").alias("r"))
    fam = F.md5(
        F.concat_ws(":", "src_id", (F.col("r") / FAM_SIZE).cast("int"))
    )
    words = F.split(F.col("text"), " ")
    salted = F.array_join(
        F.zip_with(
            words,
            F.sequence(F.lit(0), F.size(words) - 1),
            lambda w, i: F.when(
                i % 2 == 0, F.concat(w, F.lit("_"), F.substring(fam, 1, 8))
            ).otherwise(w),
        ),
        " ",
    )
    new_text = F.concat(
        salted,
        F.lit(" replica marker "),
        F.md5(F.concat_ws(":", "src_id", "r")),
    )
    (
        docs.crossJoin(reps)
        .select(
            (F.col("src_id") * REPLICAS + F.col("r")).alias("doc_id"),
            new_text.alias("text"),
            "lang",
            "source",
            F.length(new_text).cast("long").alias("n_chars"),
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def main() -> None:
    spark = get_spark("ade-scale100x")
    t0 = time.time()
    path = ensure_corpus(spark)
    build_s = round(time.time() - t0, 1)
    docs = spark.read.parquet(path)
    n_docs = docs.count()

    t0 = time.time()
    pairs = lsh_verified_pairs(docs, num_perm=32, bands=8, threshold=0.3)
    n_pairs = pairs.count()
    verify_s = round(time.time() - t0, 1)

    t0 = time.time()
    labeled = connected_components(pairs)
    n_clusters = labeled.select("cluster_id").distinct().count()
    cluster_s = round(time.time() - t0, 1)

    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "corpus_build_s": build_s,
                "lsh_verified_s": verify_s,
                "true_pairs": n_pairs,
                "clusters_s": cluster_s,
                "n_clusters": n_clusters,
            }
        )
    )


if __name__ == "__main__":
    main()
