"""spark-submit entry point:

    spark-submit --py-files webextract.zip -m webextract  # via wrapper, or
    python -m webextract --input /path/pages --output /path/extracted \
        --metrics /path/metrics --partitions 64 [--config cfg.json]

The CLI is the engine's analog of the reference's
``python inference.py -c config.yaml -i input_dir -o output_dir``
(``inference.py:28-61``): config file + input + output, resumable by
default. Config JSON carries ExtractConfig fields (the declared-schema
stance of the reference's CfgNode: unknown keys are an error).
"""

from __future__ import annotations

import argparse
import json
import sys

from .config import ExtractConfig
from .pipeline import PipelineOptions, read_pages, run_extraction, ship_package


def _load_raw_config(path: str, seen: tuple[str, ...] = ()) -> dict:
    """JSON config with ``_base_`` inheritance — the analog of the
    reference's ``_BASE_`` YAML chain (``configs/segmentation/
    segmentation_base.yaml:1``, merged in ``core/setup.py:67-177``):
    the base file loads first (relative to the child), the child's keys
    override; dict-valued keys (merge_aliases) merge per-key."""
    import os

    real = os.path.realpath(path)
    if real in seen:
        raise SystemExit(f"_base_ cycle: {' -> '.join(seen + (real,))}")
    with open(path, encoding="utf-8") as fh:
        raw = json.load(fh)
    base_ref = raw.pop("_base_", None)
    if base_ref is None:
        return raw
    base_path = os.path.join(os.path.dirname(path), base_ref)
    merged = _load_raw_config(base_path, seen + (real,))
    for key, value in raw.items():
        if isinstance(value, dict) and isinstance(merged.get(key), dict):
            merged[key] = {**merged[key], **value}
        else:
            merged[key] = value
    return merged


def load_config(path: str | None) -> ExtractConfig:
    if not path:
        return ExtractConfig()
    raw = _load_raw_config(path)
    known = set(ExtractConfig.__dataclass_fields__)
    unknown = set(raw) - known
    if unknown:  # closed schema, like CfgNode set_new_allowed(False)
        raise SystemExit(f"unknown config keys: {sorted(unknown)} "
                         f"(known: {sorted(known)})")
    return ExtractConfig(**raw)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="webextract",
                                description=__doc__.splitlines()[0])
    p.add_argument("--input", required=True,
                   help="pages parquet path or table name")
    p.add_argument("--output", required=True, help="extracted sink path")
    p.add_argument("--metrics", default=None,
                   help="lineage/metrics sink path")
    p.add_argument("--config", default=None, help="ExtractConfig JSON file")
    p.add_argument("--partitions", type=int, default=32)
    p.add_argument("--giant-bytes", type=int, default=1 << 20)
    p.add_argument("--scan-mode", choices=("single", "dual"),
                   default="single")
    p.add_argument("--run-id", default=None)
    p.add_argument("--partition-by-date", action="store_true",
                   help="hive-partition the sink by warc_date (crawl day)")
    p.add_argument("--sink-format", default="parquet",
                   choices=("parquet", "iceberg"),
                   help="sink provider; iceberg requires --sink-table and "
                        "an Iceberg catalog on the session")
    p.add_argument("--sink-table", action="store_true",
                   help="treat --output as a catalog table identifier "
                        "instead of a filesystem path")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("webextract").getOrCreate()
    ship_package(spark)
    cfg = load_config(args.config)
    opts = PipelineOptions(num_partitions=args.partitions,
                           giant_bytes=args.giant_bytes,
                           scan_mode=args.scan_mode,
                           sink_format=args.sink_format,
                           sink_is_table=args.sink_table)
    pages = read_pages(spark, args.input)
    summary = run_extraction(spark, pages, args.output,
                             metrics_path=args.metrics, cfg=cfg, opts=opts,
                             run_id=args.run_id,
                             partition_by_date=args.partition_by_date)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
