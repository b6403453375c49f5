"""r11 item 1 — A/B variants for lsh_verified_pairs on the small leg.

Variants (each bit-identical by construction — re-groupings/materializations
only, no change to what is computed):
  v0: current operator as-is
  v1: buckets localCheckpoint(eager) before the forced-SMJ band self-join
  v2: v1 + sizes localCheckpoint (doc-bounded) in the verify phase
  v3: sizes localCheckpoint only
  v4: v2 + cands localCheckpoint before verify (edge-bounded)

Usage: python tools/opt_r11_lsh_ab.py [reps] [--sharp]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ade_agente_documental_empresarial___miner_a_spark.session import get_spark  # noqa: E402
from ade_agente_documental_empresarial___miner_a_spark.operators import dedup as D  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def lsh_verified_variant(
    docs, num_perm=8, bands=4, shingle_n=2, threshold=0.3,
    ckpt_buckets=False, ckpt_sizes=False, ckpt_cands=False,
):
    id_col, text_col = "doc_id", "text"
    rows_per_band = num_perm // bands
    sigs = D.minhash_signatures(docs, text_col, id_col, num_perm, shingle_n)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.unhex(F.concat(*[F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)])).alias("key"),
        )
        for b in range(bands)
    ]
    buckets = sigs.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    if ckpt_buckets:
        buckets = buckets.localCheckpoint(eager=True)
    a = buckets.alias("a")
    b = buckets.alias("b")
    cands = (
        a.join(b.hint("merge"), ["band", "key"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
        .select("doc_a", "doc_b")
    )
    if ckpt_cands:
        cands = cands.localCheckpoint(eager=True)
    arrs = D.spread(docs, id_col).select(
        F.col(id_col), D.word_shingles(F.col(text_col), shingle_n).alias("sh_arr")
    )
    if ckpt_sizes:
        arrs = arrs  # sizes checkpoint obsolete in the array form
    return D._verify_jaccard(cands, arrs, id_col, threshold)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sharp = "--sharp" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ade-opt-r11-lsh-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def sentinel():
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id % 7)").collect()
        return time.perf_counter() - t0

    sentinel()
    print(f"sentinel start {sentinel():.3f}")

    if sharp:
        import bench
        path = bench.ensure_scale_corpus(spark, sf_dir)
        docs = spark.read.parquet(os.path.join(path, "documents.parquet"))
        kw = dict(num_perm=32, bands=8, threshold=0.3)
    else:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        kw = dict()

    variants = {
        "v0_current": lambda: D.lsh_verified_pairs(docs, **kw),
        "v1_ckpt_buckets": lambda: lsh_verified_variant(docs, ckpt_buckets=True, **kw),
        "v2_ckpt_buckets_sizes": lambda: lsh_verified_variant(docs, ckpt_buckets=True, ckpt_sizes=True, **kw),
        "v3_ckpt_sizes": lambda: lsh_verified_variant(docs, ckpt_sizes=True, **kw),
        "v4_ckpt_all": lambda: lsh_verified_variant(docs, ckpt_buckets=True, ckpt_sizes=True, ckpt_cands=True, **kw),
    }
    # value check once: all variants must produce the identical pair set
    ref = {tuple(r) for r in D.lsh_verified_pairs(docs, **kw).collect()}
    for name, make in variants.items():
        got = {tuple(r) for r in make().collect()}
        assert got == ref, f"{name} DIFFERS: {len(got)} vs {len(ref)}"
    print(f"value check OK ({len(ref)} pairs, all variants identical)")

    for name, make in variants.items():
        best = None
        for _ in range(reps):
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            noop(make())
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name:26s} best {best:.3f}s over {reps}")
    print(f"sentinel end {sentinel():.3f}")


if __name__ == "__main__":
    main()
