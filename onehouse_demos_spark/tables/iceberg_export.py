"""Public-spec Apache Iceberg metadata writer — the second jar-free
personality of the xTable story (reference M15: `xtable.md:54-59`
registers the converted Iceberg metadata via
`system.register_table(...'metadata/v2.metadata.json')`;
`xtable/xtable_hudi.yaml:17-25` lists ICEBERG as a target format).

Like tables/delta_export.py, this writes format metadata **in place**
over the table's own live base files — zero data copies. The Iceberg
spec (iceberg.apache.org/spec, format-version 2) defines three layers,
all reproduced here:

- ``metadata/v<N>.metadata.json`` — table metadata: table-uuid,
  schemas with FIELD IDS, partition specs, snapshots (each pointing at
  a manifest list), snapshot-log, plus ``version-hint.text`` (the
  HadoopTables convention xTable's register step relies on).
- ``metadata/snap-<id>-<uuid>.avro`` — the manifest LIST: one
  `manifest_file` record per manifest, Avro OCF with the spec's field
  ids carried as ``field-id`` attributes.
- ``metadata/<uuid>-m0.avro`` — the manifest: `manifest_entry`
  records wrapping `data_file` structs (content/file_path/file_format/
  partition/record_count/file_size_in_bytes), file metadata carrying
  the serialized table schema + partition spec, as the spec requires.

The Avro container files are written by the same pure-Python codec the
CDC path golden-byte-pinned against the published Avro spec
(sources/avro_codec.py::write_ocf) — no iceberg-spark runtime needed.

Personality semantics mirror the Delta exporter: snapshot = live BASE
files (read-optimized view for MOR), engine meta columns exposed like
Hudi's `_hoodie_*`, refusal to export base files whose footer stats
show live soft-delete tombstones. Tables declared with `partition_by`
export a real identity partition spec (spec fields with ids from 1000,
per-file typed `partition` structs decoded from the hive path —
matching the reference's converted tables,
`xtable/xtable_hudi.yaml:17-25` `partitionSpec: city:VALUE`) so
Iceberg planners prune manifest entries by partition without opening
footers; identity partitioning keeps the source column physical in the
data files, which ours are. Derived `partition_expr` tables export
unpartitioned (no physical source column to declare). Each sync appends one
snapshot whose single manifest lists the full live file set (spec-
legal; incremental manifest reuse is an optimization, not a
correctness requirement). Validation without an Iceberg runtime in
the sandbox: spec-structural checks + OCF round-trip + file-set and
row-count parity with the engine snapshot (tests/test_iceberg_export.py).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid

from onehouse_demos_spark.sources.avro_codec import read_ocf, write_ocf
from onehouse_demos_spark.tables.delta_export import (
    _assert_no_log_tombstones,
    _assert_no_tombstones,
)
from onehouse_demos_spark.tables.object_publish import Publisher, publisher
from onehouse_demos_spark.tables.table import (
    HIVE_DEFAULT_PARTITION,
    PP_COL,
    LakehouseTable,
)

_META_DIR = "metadata"
#: Iceberg convention: partition-spec field ids start at 1000.
_PARTITION_FIELD_ID_START = 1000

# ---------------------------------------------------------------- schema


def _iceberg_type(dt) -> object:
    from pyspark.sql import types as T

    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, T.IntegerType) or isinstance(dt, T.ShortType):
        return "int"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.TimestampType):
        return "timestamptz"
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    if isinstance(dt, T.ArrayType):
        raise NotImplementedError(
            "nested list columns in the Iceberg personality need "
            "element-id assignment — not required by any engine table"
        )
    raise NotImplementedError(f"no Iceberg mapping for {dt}")


def _iceberg_schema(
    table: LakehouseTable, prev_meta: dict | None = None
) -> tuple[dict, dict]:
    """(schema dict, {logical name -> physical on-file name}).

    Field ids are STABLE across schema evolution (Iceberg's core
    contract): reused from the previous metadata matched by PHYSICAL
    name — a RENAME COLUMN (tables/table.py, metadata-only, physical
    name unchanged) keeps its id; genuinely new columns get fresh ids
    above the previous last-column-id, and a DROP retires its id
    forever (never reassigned)."""
    from onehouse_demos_spark.tables.table import PHYSICAL_META_KEY

    schema = table._latest_schema()
    if schema is None:
        raise RuntimeError(
            "table has no committed schema yet — nothing to export"
        )
    prev_ids_by_phys: dict[str, int] = {}
    next_id = 1
    if prev_meta:
        prev_schema = next(
            s
            for s in prev_meta["schemas"]
            if s["schema-id"] == prev_meta["current-schema-id"]
        )
        names_by_id: dict[int, str] = {}
        nm_raw = (prev_meta.get("properties") or {}).get(
            "schema.name-mapping.default"
        )
        if nm_raw:
            for e in json.loads(nm_raw):
                if e.get("names"):
                    names_by_id[e["field-id"]] = e["names"][0]
        for f in prev_schema["fields"]:
            prev_ids_by_phys[names_by_id.get(f["id"], f["name"])] = f["id"]
        next_id = prev_meta.get("last-column-id", 0) + 1
    fields = []
    phys_map: dict[str, str] = {}
    for f in schema.fields:
        if f.name == PP_COL:
            continue
        phys = (f.metadata or {}).get(PHYSICAL_META_KEY, f.name)
        phys_map[f.name] = phys
        fid = prev_ids_by_phys.get(phys)
        if fid is None:
            fid = next_id
            next_id += 1
        fields.append(
            {
                "id": fid,
                "name": f.name,
                "required": False,
                "type": _iceberg_type(f.dataType),
            }
        )
    return {"type": "struct", "schema-id": 0, "fields": fields}, phys_map


# --------------------------------------------------------- partition spec


def _avro_partition_type(ice_type: str) -> object:
    """Avro encoding for an identity partition value of an Iceberg
    primitive type (spec Appendix A: date = int days, timestamps =
    long micros)."""
    simple = {
        "int": "int",
        "long": "long",
        "float": "float",
        "double": "double",
        "string": "string",
        "boolean": "boolean",
    }
    if ice_type in simple:
        return simple[ice_type]
    if ice_type == "date":
        return {"type": "int", "logicalType": "date"}
    raise NotImplementedError(
        f"identity partitioning on Iceberg type {ice_type!r} is not "
        "supported by the personality exporter — partition by "
        "int/long/float/double/string/boolean/date columns"
    )


def _decode_partition_value(raw: str, ice_type: str):
    """Typed identity partition value from its hive path segment."""
    if raw == HIVE_DEFAULT_PARTITION:
        return None
    if ice_type in ("int", "long"):
        return int(raw)
    if ice_type in ("float", "double"):
        return float(raw)
    if ice_type == "boolean":
        return raw.lower() == "true"
    if ice_type == "date":
        import datetime

        return (
            datetime.date.fromisoformat(raw) - datetime.date(1970, 1, 1)
        ).days
    return raw  # string


def _partition_spec(table: LakehouseTable, schema: dict) -> list[dict]:
    """Identity partition-spec fields for `partition_by` tables, with
    source-ids resolved against the exported schema and field-ids from
    the spec's conventional 1000 range. Derived `partition_expr`
    tables (no physical source column) export an unpartitioned spec."""
    cols = list(table.config.partition_by or [])
    if not cols:
        return []
    by_name = {f["name"]: f for f in schema["fields"]}
    fields = []
    for i, col in enumerate(cols):
        src = by_name.get(col)
        if src is None:
            raise RuntimeError(
                f"partition column {col!r} missing from exported schema"
            )
        try:
            # probe: can the identity encoder carry this type in the
            # manifest partition struct?
            _avro_partition_type(src["type"])
        except NotImplementedError:
            # Degrade to an unpartitioned spec (still a correct,
            # readable personality — file pruning just isn't offered)
            # rather than failing the whole sync for e.g. a
            # timestamp/decimal partition column (ADVICE r4).
            import warnings

            warnings.warn(
                f"iceberg personality: identity partition encoding for "
                f"column {col!r} (type {src['type']!r}) is unsupported — "
                "exporting an unpartitioned spec",
                stacklevel=2,
            )
            return []
        fields.append(
            {
                "name": col,
                "transform": "identity",
                "source-id": src["id"],
                "field-id": _PARTITION_FIELD_ID_START + i,
            }
        )
    return fields


def _partition_struct_values(
    fm, spec_fields: list[dict], schema: dict
) -> dict:
    """Per-file typed `partition` struct decoded from the hive path
    ('/'-joined on the write side, mirroring
    delta_export._partition_values)."""
    if not spec_fields:
        return {}
    parts = (fm.partition or "").split("/")
    if len(parts) != len(spec_fields):
        raise RuntimeError(
            f"file {fm.path}: partition path {fm.partition!r} does not "
            f"decode into {len(spec_fields)} value(s) for spec "
            f"{[f['name'] for f in spec_fields]}"
        )
    by_id = {f["id"]: f for f in schema["fields"]}
    return {
        pf["name"]: _decode_partition_value(
            raw, by_id[pf["source-id"]]["type"]
        )
        for pf, raw in zip(spec_fields, parts)
    }


# ------------------------------------------------- manifest avro schemas

#: `data_file` struct (spec Appendix C, required v2 fields), field ids
#: as `field-id` attributes the way Iceberg's own Avro files carry
#: them. The `partition` record is built per table from its partition
#: spec (r102 with one optional field per spec field).


def _partition_record_schema(spec_fields: list[dict], schema: dict) -> dict:
    by_id = {f["id"]: f for f in schema["fields"]}
    return {
        "type": "record",
        "name": "r102",
        "fields": [
            {
                "name": pf["name"],
                "type": [
                    "null",
                    _avro_partition_type(by_id[pf["source-id"]]["type"]),
                ],
                "field-id": pf["field-id"],
            }
            for pf in spec_fields
        ],
    }


def _manifest_entry_schema(partition_record: dict) -> dict:
    data_file = {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {"name": "partition", "type": partition_record, "field-id": 102},
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
        ],
    }
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
            {
                "name": "sequence_number",
                "type": ["null", "long"],
                "field-id": 3,
            },
            {
                "name": "file_sequence_number",
                "type": ["null", "long"],
                "field-id": 4,
            },
            {"name": "data_file", "type": data_file, "field-id": 2},
        ],
    }

_MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}


def _meta_dir(table: LakehouseTable) -> str:
    return os.path.join(table.base_path, _META_DIR)


def _current_version(meta_dir: str, pub: Publisher | None = None) -> int:
    """Version per `version-hint.text` — through the store seam when
    the caller is the writer (pub given), direct file I/O for the
    external readers below."""
    hint = os.path.join(meta_dir, "version-hint.text")
    try:
        if pub is not None:
            raw = pub.get_bytes(hint)
            if raw is None:
                return 0
            return int(raw.decode("utf-8").strip())
        with open(hint) as fh:
            return int(fh.read().strip())
    except (FileNotFoundError, ValueError):
        return 0


def sync_iceberg_metadata(
    table: LakehouseTable, now_ms: int | None = None, store=None
) -> int:
    """Create/refresh the Iceberg personality in place. Returns the
    metadata version written (or the current one when the live file
    set is unchanged). Readers follow `metadata/version-hint.text` →
    `v<N>.metadata.json` → current snapshot → manifest list →
    manifest → the table's own parquet.

    Every write flows through the ObjectStoreClient S3 contract
    (tables/object_publish.py, VERDICT r12 #1): manifests and manifest
    lists are uuid-named atomic full-object puts, the metadata.json is
    the COMMIT POINT (`PutObject + If-None-Match: *` — exactly one
    syncer owns version N), and version-hint.text is a last-writer-
    wins hint put. Writer-internal state reads (hint + previous
    metadata) ride the same seam; external readers below stay direct
    file I/O over the materialized layout."""
    now_ms = int(time.time() * 1000) if now_ms is None else now_ms
    files = table.manifest.live_files(include_logs=False)
    _assert_no_tombstones(files)
    _assert_no_log_tombstones(table)
    meta_dir = _meta_dir(table)
    pub = publisher(table.base_path, store)
    version = _current_version(meta_dir, pub)
    # The hint is a HINT: a writer that crashed between the
    # metadata.json commit point and the hint put leaves the hint one
    # behind, and trusting it would make the healthy retry re-mint the
    # already-published version (conditional-put conflict on a
    # no-contention retry). Probe forward to the true head — the same
    # recovery HadoopTables clients perform — and repair the hint.
    hinted = version
    while (
        pub.get_bytes(
            os.path.join(meta_dir, f"v{version + 1}.metadata.json")
        )
        is not None
    ):
        version += 1
    if version != hinted:
        pub.put_text(os.path.join(meta_dir, "version-hint.text"),
                     str(version))
    prev_meta = None
    if version:
        raw = pub.get_bytes(
            os.path.join(meta_dir, f"v{version}.metadata.json")
        )
        if raw is None:
            raise FileNotFoundError(
                f"version-hint names v{version} but the metadata "
                "object is missing"
            )
        prev_meta = json.loads(raw)

    schema, phys_map = _iceberg_schema(table, prev_meta)
    paths = sorted(f.path for f in files)
    # A metadata-only schema change (RENAME/DROP COLUMN) must produce a
    # new version even with an unchanged live file set — the digest
    # covers both.
    digest = hashlib.sha256(
        ("\n".join(paths) + json.dumps(schema, sort_keys=True)).encode()
    ).hexdigest()
    if prev_meta is not None and digest == prev_meta.get("properties", {}).get(
        "onehouse.live-paths-digest"
    ):
        return version

    seq = (prev_meta or {}).get("last-sequence-number", 0) + 1
    snapshot_id = int(
        hashlib.sha256(f"{digest}:{seq}".encode()).hexdigest()[:15], 16
    )

    # ---- manifest (one per snapshot, full live file set)
    spec_fields = _partition_spec(table, schema)
    entries = []
    total_rows = 0
    for fm in files:
        size = os.path.getsize(os.path.join(table.base_path, fm.path))
        total_rows += fm.rows
        entries.append(
            {
                "status": 1,  # ADDED (full rewrite manifest)
                "snapshot_id": snapshot_id,
                "sequence_number": None,  # inherited from the manifest
                "file_sequence_number": None,
                "data_file": {
                    "content": 0,  # DATA
                    "file_path": os.path.join(table.base_path, fm.path),
                    "file_format": "PARQUET",
                    "partition": _partition_struct_values(
                        fm, spec_fields, schema
                    ),
                    "record_count": fm.rows,
                    "file_size_in_bytes": size,
                },
            }
        )
    manifest_name = f"{uuid.uuid4().hex}-m0.avro"
    manifest_bytes = write_ocf(
        entries,
        _manifest_entry_schema(
            _partition_record_schema(spec_fields, schema)
        ),
        extra_meta={
            "schema": json.dumps(schema),
            "schema-id": "0",
            "partition-spec": json.dumps(spec_fields),
            "partition-spec-id": "0",
            "format-version": "2",
            "content": "data",
        },
    )
    manifest_path = os.path.join(meta_dir, manifest_name)
    pub.put_bytes(manifest_path, manifest_bytes)  # uuid-named, atomic

    # ---- manifest list
    snap_name = f"snap-{snapshot_id}-{uuid.uuid4().hex}.avro"
    list_bytes = write_ocf(
        [
            {
                "manifest_path": manifest_path,
                "manifest_length": len(manifest_bytes),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": seq,
                "min_sequence_number": seq,
                "added_snapshot_id": snapshot_id,
                "added_files_count": len(entries),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": total_rows,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        ],
        _MANIFEST_FILE_SCHEMA,
        extra_meta={"format-version": "2"},
    )
    list_path = os.path.join(meta_dir, snap_name)
    pub.put_bytes(list_path, list_bytes)  # uuid-named, atomic

    # ---- table metadata
    snapshot = {
        "snapshot-id": snapshot_id,
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "manifest-list": list_path,
        "summary": {
            "operation": "overwrite" if prev_meta else "append",
            "added-data-files": str(len(entries)),
            "added-records": str(total_rows),
        },
        "schema-id": 0,
    }
    snapshots = (prev_meta or {}).get("snapshots", []) + [snapshot]
    snapshot_log = (prev_meta or {}).get("snapshot-log", []) + [
        {"timestamp-ms": now_ms, "snapshot-id": snapshot_id}
    ]
    meta = {
        "format-version": 2,
        "table-uuid": (prev_meta or {}).get("table-uuid") or str(uuid.uuid4()),
        "location": table.base_path,
        "last-sequence-number": seq,
        "last-updated-ms": now_ms,
        "last-column-id": max(
            [f["id"] for f in schema["fields"]]
            + [(prev_meta or {}).get("last-column-id", 0)]
        ),
        "current-schema-id": 0,
        "schemas": [schema],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "last-partition-id": (
            spec_fields[-1]["field-id"] if spec_fields
            else _PARTITION_FIELD_ID_START - 1
        ),
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {
            "write.format.default": "parquet",
            "onehouse.live-paths-digest": digest,
            # Iceberg name mapping (spec §column-projection): the
            # engine's parquet files carry no field-id annotations, so
            # readers resolve fields by mapped name; after a RENAME the
            # mapped name is the PHYSICAL one still in the files.
            **(
                {
                    "schema.name-mapping.default": json.dumps(
                        [
                            {"field-id": f["id"],
                             "names": [phys_map[f["name"]]]}
                            for f in schema["fields"]
                        ]
                    )
                }
                if any(phys_map[n] != n for n in phys_map)
                else {}
            ),
        },
        "current-snapshot-id": snapshot_id,
        "snapshots": snapshots,
        "snapshot-log": snapshot_log,
        "metadata-log": (prev_meta or {}).get("metadata-log", [])
        + (
            [
                {
                    "timestamp-ms": (prev_meta or {}).get("last-updated-ms"),
                    "metadata-file": os.path.join(
                        meta_dir, f"v{version}.metadata.json"
                    ),
                }
            ]
            if prev_meta
            else []
        ),
    }
    new_version = version + 1
    # The COMMIT POINT: `PutObject + If-None-Match: *` through the
    # store seam — exactly one syncer can own version N, and readers
    # never observe a torn metadata.json. The manifests above are
    # uuid-named (collision-free) so only the version file needs the
    # conditional create.
    if not pub.put_json(
        os.path.join(meta_dir, f"v{new_version}.metadata.json"), meta,
        if_none_match=True,
    ):
        raise FileExistsError(
            f"iceberg metadata v{new_version} already published by a "
            "concurrent syncer"
        )
    # version-hint is a HINT (HadoopTables convention): an atomic
    # full-object put, so a racing reader sees either the old or the
    # new version number, never a truncated file.
    pub.put_text(os.path.join(meta_dir, "version-hint.text"),
                 str(new_version))
    return new_version


def iceberg_pruned_files(
    table_path: str, partition_predicate: dict | None = None
) -> list[str]:
    """The data-file list an Iceberg planner would scan under an
    equality predicate on identity partition columns — derived from
    manifest-entry `partition` structs alone (typed values), no footer
    reads. Raises when a predicate column is not in the current
    partition spec (an engine would fall back to scanning)."""
    meta_dir = os.path.join(table_path, _META_DIR)
    version = _current_version(meta_dir)
    if not version:
        raise FileNotFoundError(f"no iceberg metadata under {table_path}")
    with open(os.path.join(meta_dir, f"v{version}.metadata.json")) as fh:
        meta = json.load(fh)
    spec = next(
        s for s in meta["partition-specs"]
        if s["spec-id"] == meta["default-spec-id"]
    )
    declared = {f["name"] for f in spec["fields"]}
    for col in partition_predicate or {}:
        if col not in declared:
            raise ValueError(
                f"{col!r} is not in the partition spec {sorted(declared)}"
            )
    current = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    with open(current["manifest-list"], "rb") as fh:
        _, manifests = read_ocf(fh.read())
    out: list[str] = []
    for m in manifests:
        with open(m["manifest_path"], "rb") as fh:
            _, entries = read_ocf(fh.read())
        for e in entries:
            if e["status"] not in (0, 1):  # EXISTING / ADDED
                continue
            pv = e["data_file"].get("partition") or {}
            if all(
                pv.get(c) == v
                for c, v in (partition_predicate or {}).items()
            ):
                out.append(e["data_file"]["file_path"])
    return sorted(out)


def read_iceberg_snapshot(spark, table_path: str):
    """Reference reader: follow version-hint → metadata.json → current
    snapshot → manifest list → manifest(s) → parquet scan. The same
    walk any Iceberg client performs; used by tests and by engines
    without an Iceberg runtime."""
    meta_dir = os.path.join(table_path, _META_DIR)
    version = _current_version(meta_dir)
    if not version:
        raise FileNotFoundError(f"no iceberg metadata under {table_path}")
    with open(os.path.join(meta_dir, f"v{version}.metadata.json")) as fh:
        meta = json.load(fh)
    current = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    with open(current["manifest-list"], "rb") as fh:
        _, manifests = read_ocf(fh.read())
    paths: list[str] = []
    for m in manifests:
        with open(m["manifest_path"], "rb") as fh:
            _, entries = read_ocf(fh.read())
        paths.extend(
            e["data_file"]["file_path"]
            for e in entries
            if e["status"] in (0, 1)  # EXISTING / ADDED
        )
    # Reconstruct the table schema from the metadata (inverse of
    # _iceberg_type) and read WITH it, exactly like an Iceberg client
    # resolving by field name: files written before a schema evolution
    # lack the newer columns and a bare parquet read would silently
    # drop them (first-file schema wins); the explicit schema fills
    # them with null. Also keeps an emptied table reading with its
    # columns — parity with read_delta_snapshot.
    from pyspark.sql import types as T

    schema_json = next(
        s for s in meta["schemas"]
        if s["schema-id"] == meta["current-schema-id"]
    )
    inverse = {
        "long": T.LongType(), "int": T.IntegerType(),
        "double": T.DoubleType(), "float": T.FloatType(),
        "string": T.StringType(), "boolean": T.BooleanType(),
        "timestamptz": T.TimestampType(),
        "timestamp": T.TimestampNTZType(), "date": T.DateType(),
        "binary": T.BinaryType(),
    }

    def to_spark(t):
        if isinstance(t, str) and t.startswith("decimal("):
            p, sc = t[8:-1].split(",")
            return T.DecimalType(int(p), int(sc))
        return inverse[t]

    fields = [
        T.StructField(f["name"], to_spark(f["type"]), True)
        for f in schema_json["fields"]
    ]
    schema = T.StructType(fields)
    if not paths:
        return spark.createDataFrame([], schema)
    # Name mapping (schema.name-mapping.default): files without
    # field-id annotations resolve each field through its mapped
    # PHYSICAL name — the post-RENAME read path of a real Iceberg
    # client.
    names_by_id: dict[int, str] = {}
    nm_raw = (meta.get("properties") or {}).get("schema.name-mapping.default")
    if nm_raw:
        for e in json.loads(nm_raw):
            if e.get("names"):
                names_by_id[e["field-id"]] = e["names"][0]
    phys = {
        f["name"]: names_by_id.get(f["id"], f["name"])
        for f in schema_json["fields"]
    }
    reader_schema = T.StructType(
        [T.StructField(phys[f.name], f.dataType, True) for f in schema.fields]
    )
    df = spark.read.schema(reader_schema).parquet(*paths)
    if any(phys[n] != n for n in phys):
        from pyspark.sql import functions as F

        df = df.select(
            *[F.col(phys[f.name]).alias(f.name) for f in schema.fields]
        )
    return df
