"""Schema-drift tracker: snapshot/diff/fleet-scan/auto-configure."""

import json

from pyspark.sql import types as T

from firebolt_cdc_lambda_spark.config import TableKeys
from firebolt_cdc_lambda_spark.drift import SchemaDriftTracker


def schema(*fields):
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


S1 = schema(("id", T.LongType()), ("name", T.StringType()))
S2 = schema(("id", T.LongType()), ("name", T.IntegerType()),  # type change
            ("email", T.StringType()))                         # added; none removed
S3 = schema(("id", T.LongType()))                              # name removed


def test_first_sighting_no_drift(spark, tmp_path):
    tr = SchemaDriftTracker(spark, str(tmp_path))
    assert not tr.diff("users", S1).has_drift


def test_diff_detects_all_three_kinds(spark, tmp_path):
    tr = SchemaDriftTracker(spark, str(tmp_path))
    tr.snapshot("users", S1)
    d = tr.diff("users", S2)
    assert [a["column"] for a in d.added] == ["email"]
    assert [c["column"] for c in d.type_changed] == ["name"]
    assert d.removed == []
    d2 = tr.diff("users", S3)
    assert [r["column"] for r in d2.removed] == ["name"]


def test_fleet_scan_and_autoconfig(spark, tmp_path):
    tr = SchemaDriftTracker(spark, str(tmp_path))
    tk = TableKeys.from_json('{"users": "id"}')
    live = {
        "users": S1,
        "orders": schema(("orders_id", T.LongType()), ("amt", T.DoubleType())),
        "mystery": schema(("a", T.LongType()), ("b", T.LongType())),
    }
    rep = tr.scan_fleet(live, tk)
    assert rep.new_tables == {"orders": ["orders_id"], "mystery": None}
    assert rep.removed_tables == []
    merged = tr.auto_configure(rep, tk)
    assert merged.resolve("orders") == ["orders_id"]
    assert merged.should_skip("mystery")          # null PK => CDC skips it
    backup = json.load(open(tmp_path / "tables_keys.backup.json"))
    assert backup == {"users": ["id"]}


def test_removed_table_detected(spark, tmp_path):
    tr = SchemaDriftTracker(spark, str(tmp_path))
    tk = TableKeys.from_json('{"users": "id", "gone": "id"}')
    rep = tr.scan_fleet({"users": S1}, tk)
    assert rep.removed_tables == ["gone"]


def test_store_via_filesystem_uri(spark, tmp_path):
    """The store goes through the Hadoop FS API: an explicit file:// URI
    store_dir (the local stand-in for s3a://...) round-trips snapshots,
    reports, and config backups — nothing touches os.path."""
    uri = f"file://{tmp_path}/drift_store"
    tr = SchemaDriftTracker(spark, uri)
    tr.snapshot("users", S1)
    assert tr.last_known("users") == {"id": "bigint", "name": "string"}
    d = tr.diff("users", S2)
    assert [a["column"] for a in d.added] == ["email"]
    rep = tr.scan_fleet({"users": S2}, TableKeys.from_json('{"users": "id"}'))
    path = tr.save_report(rep)
    assert path.startswith(uri)
    from firebolt_cdc_lambda_spark import fsio
    doc = json.loads(fsio.read_text(spark, path))
    assert doc["drift"][0]["table"] == "users"
    merged = tr.auto_configure(rep, TableKeys.from_json('{"users": "id"}'))
    assert json.loads(fsio.read_text(
        spark, f"{uri}/tables_keys.backup.json")) == {"users": ["id"]}


def test_report_file(spark, tmp_path):
    tr = SchemaDriftTracker(spark, str(tmp_path))
    tr.snapshot("users", S1)
    rep = tr.scan_fleet({"users": S2}, TableKeys.from_json('{"users": "id"}'))
    path = tr.save_report(rep)
    doc = json.load(open(path))
    assert doc["drift"][0]["table"] == "users"
    assert doc["drift"][0]["added"] == [{"column": "email", "type": "string"}]
