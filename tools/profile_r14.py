"""Per-query isolation harness for the r14 optimization round.

Times named registry queries exactly like bench.py's headline loop
(sf0.001 warmup, best-of-2 at the target SF, .collect() as the action)
and optionally captures .explain("formatted") into plans/r14/.

Usage:
  python tools/profile_r14.py q1 q2 ...             # time best-of-2
  python tools/profile_r14.py --plans TAG q1 q2 ... # also write plans/r14/<q>_<TAG>.txt
  python tools/profile_r14.py --n 3 q1              # best-of-N

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from javascript_vector_database_spark import get_spark, registry  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plans", default=None, help="tag for plans/r14/<q>_<tag>.txt")
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    spark = get_spark(app_name="profile_r14")
    qs = registry.queries()
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    )

    for name in args.names:
        fn = qs[name]
        if not args.no_warm and os.path.isdir(warm_dir):
            try:
                fn(spark, warm_dir).collect()
            except Exception as exc:  # warmup best-effort, like bench
                print(f"[warn] warmup {name}: {exc}")
        times = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            times.append(time.perf_counter() - t0)
        if not times:
            times = [float("nan")]
        if args.plans:
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
            out = os.path.join(plans_dir, f"{name}_{args.plans}.txt")
            with open(out, "w") as fh:
                fh.write(buf.getvalue())
        print(
            f"{name}: best={min(times):.3f}s all="
            + ",".join(f"{t:.3f}" for t in times)
        )


if __name__ == "__main__":
    main()
