"""Spark-side operators: classify / repartition / extract / dedup /
similarity.  All parsing runs inside Arrow-batched UDFs; everything
relational stays in built-in pyspark.sql.functions for Catalyst + codegen.
"""
