"""Optimization round r10 — capture .explain('formatted') for the bench
surface into plans/r10/<name>_<tag>.txt and (optionally) time each query
with the noop sink (guide §1.4) so computation is measured, not the
collect/count action.

Usage:
    python tools/opt_explain_r10.py before            # all bench queries
    python tools/opt_explain_r10.py after q1 q2 ...   # only the named ones
    NOOP_TIME=1 python tools/opt_explain_r10.py before   # also time noop
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ade_agente_documental_empresarial___miner_a_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "plans", "r10")


def bench_query_names() -> list[str]:
    import bench

    names = list(dict.fromkeys(bench.HEADLINE + bench.TPCH))
    return names


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ade-opt-explain")

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = mod.queries()

    names = only or bench_query_names()
    # warm-up: JVM codegen + Arrow worker pool (same as bench.py)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    do_time = os.environ.get("NOOP_TIME", "")
    times: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        line = f"# wrote {path}"
        if do_time:
            spark.sparkContext.setJobDescription(f"opt-r10 {name}")
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            spark.sparkContext.setJobDescription(None)
            times[name] = round(best, 3)
            line += f"  noop_best3={best:.3f}s"
        print(line, file=sys.stderr)

    if do_time:
        print(json.dumps({"tag": tag, "noop_best3": times}))


if __name__ == "__main__":
    main()
