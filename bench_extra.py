#!/usr/bin/env python
"""Optimization-round isolation harness (guide §1.4) — NOT the frozen
driver bench. Times individual contract queries through the noop sink
with the same session shape as bench.py, optionally dumping
``.explain("formatted")`` to plans/<tag>/<name>_<suffix>.txt.

Usage:
    python bench_extra.py q1 q2 ...            # time listed queries
    python bench_extra.py --explain-dir plans/r06 --suffix before q1 ...
    python bench_extra.py --reps 3 q1
    python bench_extra.py --all                # every declared query

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import build_session  # same session config as the frozen bench


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain-dir")
    ap.add_argument("--suffix", default="plan")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(cpus)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = list(qs) if args.all else args.names
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    out: dict[str, float] = {}
    try:
        for name in names:
            fn = qs[name]
            spark.sparkContext.setJobDescription(f"isolate:{name}")
            if args.explain_dir:
                os.makedirs(args.explain_dir, exist_ok=True)
                df = fn(spark, sf_dir)
                with open(
                    os.path.join(args.explain_dir,
                                 f"{name}_{args.suffix}.txt"), "w"
                ) as fh:
                    fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
            if not args.no_warmup:
                fn(spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
            best = None
            for _ in range(max(1, args.reps)):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out[name] = round(best, 4)
            print(f"{name}: {out[name]}", file=sys.stderr)
    finally:
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
