"""Scalar-function surface: Flink-SQL → Spark-SQL expression
translation + UDF registration (SURVEY §2.3 O17/O23/O24)."""
