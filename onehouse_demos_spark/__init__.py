"""onehouse_demos_spark — a PySpark-native lakehouse analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities
exercised by the `alberttwong/onehouse-demos` reference stack (Hudi +
Trino + Kafka demos): primary-keyed multi-versioned Parquet tables with
insert / upsert / delete / overwrite semantics, copy-on-write and
merge-on-read storage, snapshot / read-optimized / incremental query
views, compaction / clustering / cleaning maintenance, streaming ingest
(Kafka JSON + Debezium CDC envelopes), and the analytic SQL surface of
the demos — plus large-scale training-data pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Everything is built on the public PySpark DataFrame / SQL / Structured
Streaming APIs; there is no bespoke execution engine. Catalyst plans
the physical execution; this package plans *file-level* metadata
(commit timeline, manifests) the way a lakehouse format does.
"""

from onehouse_demos_spark.session import get_spark, session_builder
from onehouse_demos_spark.tables.table import LakehouseTable, TableConfig

__all__ = ["get_spark", "session_builder", "LakehouseTable", "TableConfig"]

__version__ = "0.1.0"
