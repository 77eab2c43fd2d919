#!/usr/bin/env python
"""Round-8 optimization harness — NOT the frozen driver bench.

Times individual headline queries (same session config, same noop-sink
methodology as bench.py) so an optimization loop can isolate one query
without paying the full bench's scaling runs. Optionally dumps
``explain("formatted")`` for each timed query to plans/<tag>/.

Usage:
    python bench_extra.py                 # all headline queries, 1 run
    python bench_extra.py -q curate_full -q jaccard_pairs -n 3
    python bench_extra.py --plans plans/r08 --suffix _before

Prints one JSON line {"queries": {name: [sec, ...]}, ...} at the end.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from bench import (  # noqa: E402
    CPUS, DEDUP_STAGES, HEADLINE, SF_DIR, dedup_stage_runs, make_session,
    noop_write, settle,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-q", "--query", action="append", default=None,
                    help="query name (repeatable); default: all headline")
    ap.add_argument("-n", "--runs", type=int, default=1)
    ap.add_argument("--plans", default=None,
                    help="directory to write explain('formatted') files")
    ap.add_argument("--suffix", default="",
                    help="suffix for plan files, e.g. _before/_after")
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--plans-only", action="store_true",
                    help="dump plans without timing (needs --plans)")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from webextract.pipeline import ship_package

    if not args.plans_only:
        settle()  # same quiet-window wait as bench.py's headline runs
    spark = make_session(CPUS)
    ship_package(spark)
    if not args.no_warmup:
        from webextract.fixtures import pages_dataframe
        from webextract.pipeline import PipelineOptions, extract_dataframe

        noop_write(extract_dataframe(
            pages_dataframe(spark, 2000, num_partitions=CPUS,
                            giant_every=0),
            opts=PipelineOptions(num_partitions=CPUS)))

    queries = entrymod.queries()
    names = args.query or (HEADLINE + ["curate_full_approx"]
                           + list(DEDUP_STAGES))
    plan_dir = Path(args.plans) if args.plans else None
    if plan_dir:
        plan_dir.mkdir(parents=True, exist_ok=True)

    results: dict[str, list[float]] = {}
    for r in range(args.runs):
        timings: dict[str, float] = {}
        staged = [n for n in names if n in DEDUP_STAGES]
        for name in names:
            if name in DEDUP_STAGES:
                continue
            if name == "curate_full_approx":
                fn = lambda s, d: entrymod.q_curate_full(  # noqa: E731
                    s, d, budget_mode="approx")
            else:
                fn = queries[name]
            if plan_dir and r == 0:
                df = fn(spark, SF_DIR)
                (plan_dir / f"{name}{args.suffix}.txt").write_text(
                    spark._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
                if args.plans_only:
                    print(f"[extra] {name}: plan dumped", file=sys.stderr)
                    continue
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.perf_counter()
            noop_write(fn(spark, SF_DIR))
            timings[name] = round(time.perf_counter() - t0, 3)
            spark.sparkContext.setJobDescription(None)
            print(f"[extra] {name}: {timings[name]}s", file=sys.stderr)
        if staged:
            dedup_stage_runs(spark, timings)
        for k, v in timings.items():
            results.setdefault(k, []).append(v)
        spark.catalog.clearCache()
    spark.stop()
    mins = {k: min(v) for k, v in results.items()}
    print(json.dumps({
        "metric": "bench_extra_per_query_sec",
        "sf": SF_DIR, "cpus": CPUS, "runs": args.runs,
        "queries": results, "queries_min": mins,
        "total_min": round(sum(mins.values()), 3),
    }))


if __name__ == "__main__":
    main()
