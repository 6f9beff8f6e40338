"""Column-level function library (all built-in pyspark.sql.functions —
JVM-side, whole-stage-codegen'd; no Python UDFs in any hot path)."""
