#!/usr/bin/env python
"""Approx-vs-exact token-budget crossover at synthetic scale (round-8).

The round-7 verdict asked for a measured crossover point: at sf0.1
(5k docs) ``token_budget_sample(mode="approx")`` pays fixed sketch/AQE
overhead and loses to the exact windowed sort; the at-scale claim — the
histogram prune avoids sorting the whole corpus per stratum — was
plan-level argument only. This bench generates an N-row synthetic docs
table (deterministic hash-derived priorities, 4 strata), times both
modes to a noop sink (min of ``--reps``), and asserts the two modes
return IDENTICAL rows before timing.

Usage: python bench_budget_scale.py [--rows 2000000] [--reps 2]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from bench import CPUS, make_session, noop_write  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--budget", type=int, default=100_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from webextract.functions.hygiene import token_budget_sample

    spark = make_session(CPUS)
    path = f"/tmp/webextract_bench/budget_docs_{args.rows}.parquet"
    if not Path(path).exists():
        # deterministic synthetic corpus: 4 strata, hash-derived
        # priority, ~12-word texts (token counts vary 8..18)
        n_words = (F.abs(F.xxhash64("id")) % 11 + 8).cast("int")
        df = (spark.range(args.rows)
              .select(F.col("id").alias("doc_id"),
                      F.concat(F.lit("s"),
                               (F.col("id") % 4).cast("string"))
                      .alias("source"),
                      (F.abs(F.xxhash64("id", F.lit(1))) % 1_000_000)
                      .cast("double").alias("priority"),
                      F.array_repeat(F.lit("word"), n_words)
                      .alias("_w")))
        df = df.withColumn("text", F.array_join("_w", " ")).drop("_w")
        df.repartition(CPUS * 2).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)

    def run(mode):
        return token_budget_sample(
            docs, budget_tokens=args.budget, strata_col="source",
            priority_col="priority", mode=mode)

    # equivalence first: identical rows in both modes
    mismatch = run("exact").exceptAll(run("approx")).count() \
        + run("approx").exceptAll(run("exact")).count()
    assert mismatch == 0, f"mode rows differ: {mismatch}"
    spark.catalog.clearCache()

    out = {}
    for mode in ("exact", "approx"):
        walls = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            noop_write(run(mode))
            walls.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[mode] = min(walls)
        print(f"[budget-scale] {mode}: {walls}", file=sys.stderr)
    spark.stop()
    print(json.dumps({
        "metric": "token_budget_exact_vs_approx_sec",
        "rows": args.rows, "budget_tokens": args.budget, "cpus": CPUS,
        "exact_sec": out["exact"], "approx_sec": out["approx"],
        "approx_over_exact": round(out["approx"] / out["exact"], 3),
        "rows_identical": True,
    }))


if __name__ == "__main__":
    main()
