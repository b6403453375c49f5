"""Audit PLAN-BUILD time for every catalog entry.

tools/parity.py, the driver gate, and bench.py all time the collect;
the cost of CONSTRUCTING the DataFrame (py4j expression building, any
driver-side collects the callable performs, literal codebooks) is
invisible in every recorded artifact. This tool times exactly that:
``fn(spark, sf_dir)`` without executing the result. It is how the
169-second hidden build of ``sim_pq_adc_topk`` was found (round 5;
fixed by packing per-centroid HOFs into one transform — see
operators/ann.py:pq_encode and the py4j notes in docs/SCALING.md).

Callables that trigger their own jobs (codebook collects, persisted
index builds) legitimately show seconds here — the flag to chase is
tens of seconds with no job on the UI, which is pure py4j expression
construction.

Usage: python tools/build_audit.py [threshold_s]   (default 2.0)
       SF_DIR=... to change fixtures; prints entries over threshold,
       slowest first, plus a total.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0

    from ade_agente_documental_empresarial___miner_a_spark.plans import catalog
    from ade_agente_documental_empresarial___miner_a_spark.session import get_spark

    spark = get_spark("build-audit", shuffle_partitions=8)
    times: list[tuple[float, str]] = []
    for name, fn in catalog.queries().items():
        t0 = time.time()
        try:
            fn(spark, sf_dir)
            times.append((time.time() - t0, name))
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {e}")
    times.sort(reverse=True)
    total = sum(t for t, _ in times)
    print(f"\n{len(times)} entries, total build {total:.1f}s; over {threshold}s:")
    for t, name in times:
        if t < threshold:
            break
        print(f"  {t:7.2f}s  {name}")


if __name__ == "__main__":
    main()
