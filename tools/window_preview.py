"""Print the driver-facing CORRECTNESS window: the first N queries()
entries with their tier and latest recorded driver verdict.

Usage: python tools/window_preview.py [N]   (default 50)

Sanity-check this after any catalog edit: the driver certifies only the
first ~50 names per round, so the window head must be exactly
_PRIORITY, then _RECHECK, then never-checked names (see
plans/catalog.py::driver_ordered and the pinned invariants in
tests/test_entry_contract.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "__spark_entry__.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from ade_agente_documental_empresarial___miner_a_spark.plans.catalog import (
        _DRIVER_GREEN,
        _PRIORITY,
        _RECHECK,
        _VERDICTS,
    )

    order = list(mod.queries())
    oracles = set(mod.oracle_sql())
    never = [m for m in order if m not in _DRIVER_GREEN]
    print(
        f"catalog: {len(order)} entries, {len(oracles)} oracle-paired; "
        f"settled-green {len([m for m in order if m in _DRIVER_GREEN])}, "
        f"never-driver-checked {len(never)}, "
        f"priority {len(_PRIORITY)}, recheck {len(_RECHECK)}\n"
    )
    for i, name in enumerate(order[:n]):
        tier = (
            "PRIORITY"
            if name in _PRIORITY
            else "RECHECK"
            if name in _RECHECK and name in _DRIVER_GREEN
            else "never"
            if name not in _DRIVER_GREEN
            else "green"
        )
        verdict = _VERDICTS.get(name)
        rec = "-" if verdict is None else ("green" if verdict else "RED")
        oracle = "" if name in oracles else "  (rows-only)"
        print(f"{i:3d}  {tier:8s} last={rec:5s}  {name}{oracle}")


if __name__ == "__main__":
    main()
