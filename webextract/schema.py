"""Fixed StructType schemas for every table the engine touches.

The reference's schema system is a declared, closed config (CfgNode with
``set_new_allowed(False)``, ``core/setup.py:94``) plus a fixed PAGE-XML
element hierarchy (``page_xml/page_xml_editor.py:19-221``). Here the same
stance: every table has a fixed StructType; spans are
``array<struct<...>>`` — the DOM-era analog of (polygon, class, reading
order) per region.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# input table — matches BASELINE.json input_hint exactly
PAGES_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("html", BinaryType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])

SPAN_STRUCT = StructType([
    StructField("span_id", StringType(), False),
    StructField("region_class", StringType(), False),
    StructField("region_type", StringType(), False),
    StructField("char_start", LongType(), False),
    StructField("char_end", LongType(), False),
    StructField("reading_order", IntegerType(), False),
    StructField("confidence", DoubleType(), False),
])

# text-line sub-spans (P7/P8 analog: baselines nested under regions)
LINE_SPAN_STRUCT = StructType([
    StructField("line_id", StringType(), False),
    StructField("parent_span_id", StringType(), False),
    StructField("char_start", LongType(), False),
    StructField("char_end", LongType(), False),
    StructField("line_order", IntegerType(), False),
])

# output table — extracted text + typed layout spans per url
EXTRACTED_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("extracted_text", StringType(), True),
    StructField("spans", ArrayType(SPAN_STRUCT, False), True),
    StructField("line_spans", ArrayType(LINE_SPAN_STRUCT, False), True),
    StructField("n_spans", IntegerType(), True),
    StructField("mean_confidence", DoubleType(), True),
    StructField("content_kind", StringType(), True),   # html | pdf | empty
    StructField("error", StringType(), True),
    StructField("n_bytes_in", LongType(), True),
    StructField("parse_us", LongType(), True),
    StructField("partition_id", IntegerType(), True),
    StructField("run_id", StringType(), True),
])

# optional per-block feature/score debug sink (S8 analog: the reference's
# optional per-pixel score-map output, page_xml/output_page_xml.py:156-189)
# — what the boilerplate classifier saw and decided for EVERY block,
# kept or dropped; the threshold-tuning surface on real crawls
BLOCK_SCORES_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("block_order", IntegerType(), False),
    StructField("tag", StringType(), False),
    StructField("marginal", BooleanType(), False),
    StructField("n_chars", LongType(), False),
    StructField("link_density", DoubleType(), False),
    StructField("region_class", StringType(), False),
    StructField("confidence", DoubleType(), False),
    StructField("kept", BooleanType(), False),
])

# per-partition lineage + throughput (north_rule requirement; analog of the
# reference's provenance stamp, page_xml_editor.py:166-215 + Prometheus
# counters, api/flask_app.py:120-130)
METRICS_SCHEMA = StructType([
    StructField("run_id", StringType(), False),
    StructField("partition_id", IntegerType(), False),
    StructField("n_rows", LongType(), False),
    StructField("n_bytes_in", LongType(), False),
    StructField("n_failed", LongType(), False),
    StructField("wall_ms", LongType(), False),
    StructField("git_hash", StringType(), True),
    StructField("config_hash", StringType(), True),
])
