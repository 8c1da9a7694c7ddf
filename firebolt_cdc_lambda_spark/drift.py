"""Schema-drift tracking across the table fleet.

Ports the reference's tracker semantics (Spark-native):

* per-table last-known schema persisted as JSON; drift = added /
  removed / type-changed columns vs the stored snapshot
  (lambda_schema_evolution_integration.py:32-108 — detect and REPORT,
  never auto-apply removals/changes);
* fleet scan: new tables = live catalog − configured set, removed
  tables = configured − live (schema_evolution_tracker.py:111-118, :186);
* new-table PK auto-configuration via primary-index/name heuristics
  (schema_evolution_tracker.py:137-158) with config backup before save
  (:231-278).

Storage is a plain JSON document per table under ``store_dir``, accessed
through the Hadoop FileSystem API (fsio) — so an object-store store_dir
(s3a://...) works identically to a local path, matching the reference
keeping this metadata in S3.  The tracker is driver-side by design: the
documents are KB-sized and touched once per fleet scan, never per row.
"""

from __future__ import annotations

import datetime as _dt
import json
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from . import fsio
from .config import TableKeys, infer_primary_key


@dataclass
class TableDrift:
    table: str
    added: list[dict] = field(default_factory=list)
    removed: list[dict] = field(default_factory=list)
    type_changed: list[dict] = field(default_factory=list)

    @property
    def has_drift(self) -> bool:
        return bool(self.added or self.removed or self.type_changed)


@dataclass
class FleetReport:
    new_tables: dict[str, list[str] | None] = field(default_factory=dict)
    removed_tables: list[str] = field(default_factory=list)
    drift: list[TableDrift] = field(default_factory=list)


class SchemaDriftTracker:
    def __init__(self, spark: SparkSession, store_dir: str):
        self.spark = spark
        self.store_dir = store_dir.rstrip("/")
        fsio.mkdirs(spark, self.store_dir)

    def _path(self, table: str) -> str:
        return f"{self.store_dir}/{table}.schema.json"

    def snapshot(self, table: str, schema: T.StructType) -> None:
        doc = {
            "table": table,
            "captured_at": _dt.datetime.now(_dt.timezone.utc).isoformat(),
            "columns": {f.name: f.dataType.simpleString() for f in schema.fields},
        }
        fsio.write_text(self.spark, self._path(table), json.dumps(doc, indent=2))

    def last_known(self, table: str) -> dict[str, str] | None:
        text = fsio.read_text(self.spark, self._path(table))
        return None if text is None else json.loads(text)["columns"]

    def diff(self, table: str, schema: T.StructType) -> TableDrift:
        """Current schema vs last snapshot; report-only semantics."""
        drift = TableDrift(table)
        previous = self.last_known(table)
        current = {f.name: f.dataType.simpleString() for f in schema.fields}
        if previous is None:
            return drift  # first sighting: nothing to drift against
        for name, dtype in current.items():
            if name not in previous:
                drift.added.append({"column": name, "type": dtype})
            elif previous[name] != dtype:
                drift.type_changed.append(
                    {"column": name, "from": previous[name], "to": dtype})
        for name, dtype in previous.items():
            if name not in current:
                drift.removed.append({"column": name, "type": dtype})
        return drift

    def scan_fleet(self, live: dict[str, T.StructType],
                   configured: TableKeys) -> FleetReport:
        """Diff the live table fleet against config + snapshots; propose
        PKs for newly-appearing tables (None = needs manual config,
        mirroring the null-PK skip contract)."""
        report = FleetReport()
        for table, schema in live.items():
            if table not in configured.keys:
                cols = [f.name for f in schema.fields]
                report.new_tables[table] = infer_primary_key(table, cols)
            d = self.diff(table, schema)
            if d.has_drift:
                report.drift.append(d)
        for table in configured.keys:
            if table not in live:
                report.removed_tables.append(table)
        return report

    def auto_configure(self, report: FleetReport, configured: TableKeys,
                       backup: bool = True) -> TableKeys:
        """Apply PK proposals to the registry (with a backup of the
        previous config, schema_evolution_tracker.py:231-278)."""
        if backup:
            fsio.write_text(self.spark,
                            f"{self.store_dir}/tables_keys.backup.json",
                            json.dumps(configured.keys, indent=2))
        merged = dict(configured.keys)
        merged.update(report.new_tables)
        return TableKeys(keys=merged, default_key=configured.default_key)

    def save_report(self, report: FleetReport) -> str:
        path = (f"{self.store_dir}/drift_report_"
                f"{_dt.datetime.now(_dt.timezone.utc):%Y%m%dT%H%M%S}.json")
        doc = {
            "new_tables": report.new_tables,
            "removed_tables": report.removed_tables,
            "drift": [
                {"table": d.table, "added": d.added, "removed": d.removed,
                 "type_changed": d.type_changed}
                for d in report.drift
            ],
        }
        fsio.write_text(self.spark, path, json.dumps(doc, indent=2))
        return path
