"""r11 item 1 — profile the dedup_lsh_verified SMALL leg (sf0.1, 5k docs,
num_perm=8/bands=4) phase by phase with the noop sink (guide §1.4), and
print the executed (post-AQE) plan of the candidates join so we can see
whether the forced-SMJ exchanges get coalesced.

Usage: python tools/opt_r11_lshprof.py [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ade_agente_documental_empresarial___miner_a_spark.session import get_spark  # noqa: E402
from ade_agente_documental_empresarial___miner_a_spark.operators.dedup import (  # noqa: E402
    lsh_candidate_pairs,
    lsh_verified_pairs,
    minhash_signatures,
)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, make, reps):
    best = None
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        noop(make())
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:35s} best {best:.3f}s over {reps}")
    spark.sparkContext.setJobDescription(None)
    return best


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ade-opt-r11-lshprof")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = docs.count()
    print(f"docs: {n}")

    timed(spark, "sigs (minhash 8-perm)", lambda: minhash_signatures(docs), reps)
    timed(spark, "candidates (band join)", lambda: lsh_candidate_pairs(docs), reps)
    timed(spark, "verified (full leg)", lambda: lsh_verified_pairs(docs), reps)

    # executed plan of candidates after an action
    cands = lsh_candidate_pairs(docs)
    noop(cands)
    print("=== candidates executed plan (post-AQE) ===")
    print(cands._jdf.queryExecution().executedPlan().toString()[:8000])

    full = lsh_verified_pairs(docs)
    noop(full)
    print("=== verified executed plan (post-AQE) ===")
    print(full._jdf.queryExecution().executedPlan().toString()[:9000])


if __name__ == "__main__":
    main()
