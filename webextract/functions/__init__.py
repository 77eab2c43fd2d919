"""Training-data-pipeline column functions.

Everything in this package is expressed with built-in
``pyspark.sql.functions`` (JVM-side, whole-stage-codegen'd) unless a
vectorized pandas UDF is genuinely required — the same "zero per-row
Python on the hot path" stance as the extraction pipeline.

Hash parity note: integer hashes are derived as
``conv(substring(md5(x), 1, 15), 16, 10)`` — 60 bits of md5 as a bigint —
because this exact expression evaluates identically in Spark SQL and
DuckDB, which is what makes the MinHash/SimHash oracles exact rather than
rows-only.
"""
