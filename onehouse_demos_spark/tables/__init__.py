"""Lakehouse table layer: commit timeline + manifest-driven planning.

Re-implements the table semantics the reference exercises through Hudi
(insert/upsert/delete/bulk_insert/overwrite, COW + MOR storage,
snapshot / read-optimized / incremental views, compaction, clustering,
cleaning, optimistic concurrency) as a metadata layer over plain
Parquet + PySpark. Reference semantics: SURVEY.md §1-2; Hudi demo
walkthrough `hudi-spark-minio-trino/README.md` (timeline `:252`,
views `:341-344`, compaction `:1126-1160`).

Scale stance: the reader NEVER lists data directories — all planning
is manifest-driven (file lists, partition values, per-file key ranges
live in commit metadata), so planning cost is O(metadata), not
O(files-on-storage), which is what survives 100 TB.
"""
