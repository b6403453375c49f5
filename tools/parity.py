"""Local mimic of the driver's correctness gate.

Runs every ``queries()[name]`` on Spark and the matching ``oracle_sql()``
on DuckDB over the same parquet fixtures, then compares row count, column
names/types, and exact values (rows sorted, columns sorted by name).

Usage:  python tools/parity.py [name ...]   (default: all, sf0.01)
        SF_DIR=/root/testdata/sf0.001 python tools/parity.py
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_conn(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def normalize(rows, cols):
    """Sort columns by name, then rows by stringified tuple."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda r: tuple(str(x) for x in r))
    return [cols[i] for i in order], out


def cells_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        if isinstance(a, float) and isinstance(b, float):
            if math.isnan(a) and math.isnan(b):
                return True
            return a == b
        return float(a) == float(b)
    return a == b


def compare(name, spark_df, con, sql, verbose=False):
    t0 = time.time()
    srows = spark_df.collect()
    scols = spark_df.columns
    t_spark = time.time() - t0
    t0 = time.time()
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    t_duck = time.time() - t0

    problems = []
    if sorted(scols) != sorted(dcols):
        problems.append(f"columns differ: spark={sorted(scols)} duck={sorted(dcols)}")
    if len(srows) != len(drows):
        problems.append(f"rowcount differs: spark={len(srows)} duck={len(drows)}")
    if not problems:
        _, sn = normalize([tuple(r) for r in srows], scols)
        _, dn = normalize(drows, dcols)
        n_bad = 0
        first_bad = None
        max_float_diff = 0.0
        for i, (sr, dr) in enumerate(zip(sn, dn)):
            for j, (a, b) in enumerate(zip(sr, dr)):
                if not cells_equal(a, b):
                    n_bad += 1
                    if isinstance(a, float) and isinstance(b, float):
                        max_float_diff = max(max_float_diff, abs(a - b))
                    if first_bad is None:
                        first_bad = (i, j, a, b)
                    break
        if n_bad:
            problems.append(
                f"{n_bad}/{len(sn)} rows differ; first at row {first_bad[0]} "
                f"col {first_bad[1]}: spark={first_bad[2]!r} duck={first_bad[3]!r} "
                f"(max float diff {max_float_diff:.3e})"
            )
    status = "OK " if not problems else "FAIL"
    print(f"{status} {name:32s} rows={len(srows):7d} spark={t_spark:6.2f}s duck={t_duck:6.2f}s"
          + ("" if not problems else "\n     " + "\n     ".join(problems)))
    return not problems, len(srows), round(t_spark, 3), round(t_duck, 3)


def main():
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__spark_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from ade_agente_documental_empresarial___miner_a_spark.session import get_spark

    spark = get_spark("parity", shuffle_partitions=16)
    con = duck_conn(sf_dir)
    qs = mod.queries()
    oracles = mod.oracle_sql()
    ok = bad = rows_only = 0
    records: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            df = fn(spark, sf_dir)
            n = df.count()
            print(f"ROWS {name:32s} rows={n:7d} (no oracle — rows-only)")
            rows_only += 1
            records[name] = {"status": "rows_only", "rows": n}
            continue
        try:
            good, n, t_s, t_d = compare(
                name, fn(spark, sf_dir), con, oracles[name]
            )
            records[name] = {
                "status": "ok" if good else "fail",
                "rows": n,
                "t_spark": t_s,
                "t_duck": t_d,
            }
            if good:
                ok += 1
            else:
                bad += 1
        except Exception as e:  # noqa: BLE001
            bad += 1
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            records[name] = {
                "status": "err", "error": f"{type(e).__name__}: {e}"
            }
    print(f"\n{ok} ok, {bad} failed, {rows_only} rows-only")
    # machine-readable artifact (PARITY_JSON=path): the full-catalog
    # gate evidence in the same shape as the driver's CORRECTNESS files
    out = os.environ.get("PARITY_JSON")
    if out:
        import json

        with open(out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "summary": {
                        "ok": ok, "failed": bad, "rows_only": rows_only
                    },
                    "entries": records,
                },
                f,
                indent=1,
            )
        print(f"wrote {out}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
