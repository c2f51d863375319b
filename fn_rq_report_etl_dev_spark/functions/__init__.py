"""Column-level building blocks. Everything here composes pyspark.sql
built-in functions (JVM-side, whole-stage-codegen-eligible); no
row-at-a-time Python UDFs."""
