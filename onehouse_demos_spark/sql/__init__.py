"""SQL surface: DDL/DML over lakehouse tables + passthrough to Spark
SQL (SURVEY §2.2 M5/M6/M10, §2.3)."""

from onehouse_demos_spark.sql.engine import Engine

__all__ = ["Engine"]
