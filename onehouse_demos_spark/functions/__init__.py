"""Column-level function library (pure `pyspark.sql.functions`
compositions — JVM-side, codegen-friendly; no Python UDFs in hot
paths)."""
