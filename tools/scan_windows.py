"""One-off audit: list every registered query with an unpartitioned
WindowExec (windowspecdefinition with no partition columns), excluding
rank.py-discipline __pid-ordered offset windows.  The permanent guard
lives in tests/test_registry_sweep.py (UNPART_WINDOW_ALLOWED); this tool
regenerates its candidate list."""

from __future__ import annotations

import sys

from javascript_vector_database_spark import registry
from javascript_vector_database_spark.plancheck import (
    unpartitioned_window_keys,
)
from javascript_vector_database_spark.session import get_spark


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(cpus=8)
    for name, fn in sorted(registry.queries().items()):
        try:
            plan = fn(spark, sf)._jdf.queryExecution().sparkPlan().toString()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: PLAN-ERROR {exc}")
            continue
        keys = unpartitioned_window_keys(plan)
        if keys:
            print(f"{name}: {keys}")


if __name__ == "__main__":
    main()
