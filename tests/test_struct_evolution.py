"""Additive NESTED (struct field) schema evolution: a batch may add a
field inside a struct column; files written before the field existed
serve NULL for it. Spark's CAST cannot widen a struct, so every read
path rebuilds structs explicitly: DataFrame slices via
``table.conform_expr``, compiled SQL views via ``catalog._conform_sql``,
the change stream via declared-type dict coercion. Iceberg does this
with field IDs (schema-evolution spec); the manifest pins each
version's schema so time travel shows the pre-evolution shape.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.lake import (
    ParquetLakeTable,
)

OLD = ("id long, payload struct<a:int,b:string>, "
       "_op string, _op_timestamp timestamp, _txn_id long")
NEW = ("id long, payload struct<a:int,b:string,c:double>, "
       "_op string, _op_timestamp timestamp, _txn_id long")
T1 = dt.datetime(2024, 1, 1)
T2 = dt.datetime(2030, 1, 1)


def _mk(spark, tmp_path, **kw):
    t = ParquetLakeTable(spark, str(tmp_path / "t"), key_cols=["id"],
                         partition_col=None, allow_schema_evolution=True,
                         **kw)
    df = spark.createDataFrame(
        [(1, (10, "x"), "upsert", T1, 1), (2, (20, "y"), "upsert", T1, 1)],
        OLD,
    )
    t.merge(df)
    return t


def _evolve(spark, t):
    batch = spark.createDataFrame(
        [(3, (30, "z", 3.5), "upsert", T2, 2),
         (1, (11, "x2", 1.5), "upsert", T2, 2)],
        NEW,
    )
    t.merge(batch)


def _expect(t):
    got = {r["id"]: (r["payload"]["a"], r["payload"]["b"], r["payload"]["c"])
           for r in t.read_data().collect()}
    assert got == {1: (11, "x2", 1.5), 2: (20, "y", None), 3: (30, "z", 3.5)}


def test_struct_evolution_cow(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v_before = t.current_version()
    _evolve(spark, t)
    assert "c:double" in dict(t.read_data().dtypes)["payload"]
    _expect(t)
    # time travel BEFORE the evolution: narrow struct, old values
    old = t.read_data(as_of_version=v_before)
    assert "c:double" not in dict(old.dtypes)["payload"]
    assert {r["id"]: r["payload"]["a"] for r in old.collect()} == {1: 10, 2: 20}


def test_struct_evolution_mor_and_scan(spark, tmp_path):
    t = _mk(spark, tmp_path, merge_mode="mor")
    _evolve(spark, t)  # delta append; base files keep the narrow struct
    _expect(t)
    # scan() goes through _read_files_slice — same conform requirement
    got = {r["id"]: r["payload"]["c"] for r in t.scan([]).collect()}
    assert got == {1: 1.5, 2: None, 3: 3.5}


def test_struct_evolution_sql_view(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.register_sql("se_t", database="se_db")
    _evolve(spark, t)  # commit re-registers the view against new schema
    rows = spark.sql(
        "SELECT id, payload.a AS a, payload.c AS c FROM se_db.se_t "
        "ORDER BY id"
    ).collect()
    assert [(r["id"], r["a"], r["c"]) for r in rows] == [
        (1, 11, 1.5), (2, 20, None), (3, 30, 3.5)]


def test_struct_evolution_change_stream(spark, tmp_path):
    from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.sources.lake_stream import (
        register_lake_stream,
    )

    t = _mk(spark, tmp_path)
    _evolve(spark, t)
    register_lake_stream(spark)
    rows: list = []
    q = (
        spark.readStream.format("lake-changes")
        .option("path", t.path).option("keys", "id").load()
        .writeStream.foreachBatch(lambda d, b: rows.extend(d.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["id"]: (r["payload"]["a"], r["payload"]["c"]) for r in rows}
    assert got == {1: (11, 1.5), 2: (20, None), 3: (30, 3.5)}


def test_nested_widen_int_to_long(spark, tmp_path):
    """widen_column on a dotted path (Iceberg nested promotion): the
    struct leaf promotes metadata-only; narrow old files conform at
    read through the recursive struct rebuild; merges land the wide
    type; time travel shows the narrow shape; SQL views agree."""
    t = _mk(spark, tmp_path)
    t.widen_column("payload.a", "bigint")
    got = dict(t.read_data().dtypes)
    assert got["payload"] == "struct<a:bigint,b:string>"
    assert {r["id"]: r["payload"]["a"]
            for r in t.read_data().collect()} == {1: 10, 2: 20}
    # merge a wide value beyond int range
    big = 5_000_000_000
    wide = spark.createDataFrame(
        [(3, (big, "z"), "upsert", T2, 2)],
        "id long, payload struct<a:bigint,b:string>, "
        "_op string, _op_timestamp timestamp, _txn_id long",
    )
    t.merge(wide)
    vals = {r["id"]: r["payload"]["a"] for r in t.read_data().collect()}
    assert vals == {1: 10, 2: 20, 3: big}
    # time travel: pre-widen schema is narrow
    old = dict(t.read_data(as_of_version=1).dtypes)
    assert old["payload"] == "struct<a:int,b:string>"
    # compiled SQL view agrees
    name = t.register_sql("nested_widen_view")
    got_sql = {r["id"]: r["a"] for r in t.spark.sql(
        f"SELECT id, payload.a AS a FROM {name}").collect()}
    assert got_sql == vals


def test_nested_widen_guards(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="does not exist"):
        t.widen_column("payload.nope", "bigint")
    with pytest.raises(ValueError, match="cannot widen"):
        t.widen_column("payload.b", "bigint")  # string -> long: no
    with pytest.raises(ValueError, match="cannot widen"):
        t.widen_column("payload.a", "int")  # no-op/narrowing


def test_nested_rename_reads_old_files(spark, tmp_path):
    """rename_column('payload.a', 'z'): metadata-only; files written
    before the rename serve their nested bytes under the new name in
    the DataFrame path AND the compiled SQL view; time travel shows
    the old shape; re-introducing the retired nested name is banned."""
    t = _mk(spark, tmp_path)
    t.rename_column("payload.a", "z")
    got = dict(t.read_data().dtypes)
    assert got["payload"] == "struct<z:int,b:string>"
    assert {r["id"]: r["payload"]["z"]
            for r in t.read_data().collect()} == {1: 10, 2: 20}
    # merge new data under the new shape
    new = spark.createDataFrame(
        [(3, (30, "w"), "upsert", T2, 2)],
        "id long, payload struct<z:int,b:string>, "
        "_op string, _op_timestamp timestamp, _txn_id long",
    )
    t.merge(new)
    assert {r["id"]: r["payload"]["z"]
            for r in t.read_data().collect()} == {1: 10, 2: 20, 3: 30}
    # SQL view resolves the nested rename for pre-rename files too
    name = t.register_sql("nested_rename_view")
    got_sql = {r["id"]: r["z"] for r in t.spark.sql(
        f"SELECT id, payload.z AS z FROM {name}").collect()}
    assert got_sql == {1: 10, 2: 20, 3: 30}
    # time travel: pre-rename schema
    old = dict(t.read_data(as_of_version=1).dtypes)
    assert old["payload"] == "struct<a:int,b:string>"
    # the retired nested name cannot come back through a batch
    stale = spark.createDataFrame(
        [(4, (40, "v", 1.0), "upsert", T2, 3)],
        "id long, payload struct<a:int,b:string,c:double>, "
        "_op string, _op_timestamp timestamp, _txn_id long",
    )
    with pytest.raises(ValueError, match="renamed away"):
        t.merge(stale)


def test_nested_drop_and_guards(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.drop_column("payload.b")
    assert dict(t.read_data().dtypes)["payload"] == "struct<a:int>"
    assert {r["id"]: r["payload"]["a"]
            for r in t.read_data().collect()} == {1: 10, 2: 20}
    with pytest.raises(ValueError, match="last field"):
        t.drop_column("payload.a")
    # struct-first ordering: a struct with nested history cannot rename
    with pytest.raises(ValueError, match="struct-first"):
        t.rename_column("payload", "blob")


def test_nested_rename_change_stream(spark, tmp_path):
    """The readStream diff resolves renamed nested keys in OLD files
    and does not report unchanged rows as updates across the boundary."""
    from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.sources import (
        register_lake_stream,
    )

    t = _mk(spark, tmp_path)
    t.rename_column("payload.a", "z")
    # rewrite one row post-rename (forces a diff task for the slice)
    t.merge(spark.createDataFrame(
        [(2, (99, "y"), "upsert", T2, 2)],
        "id long, payload struct<z:int,b:string>, "
        "_op string, _op_timestamp timestamp, _txn_id long",
    ))
    register_lake_stream(spark)
    out_dir = str(tmp_path / "out")
    q = (
        spark.readStream.format("lake-changes")
        .option("path", t.path)
        .option("keys", "id")
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out_dir).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["id"], []).append(r)
    # key 2's final image carries the renamed field with the new value
    finals = [r for r in by_key[2] if r["_change_type"] != "delete"]
    assert any(r["payload"]["z"] == 99 for r in finals)
    # key 1 was untouched after the initial insert: no spurious update
    kinds_1 = {r["_change_type"] for r in by_key.get(1, [])}
    assert "update_postimage" not in kinds_1


def test_broadcast_resolver_with_additive_evolution(spark, tmp_path):
    """The broadcast merge resolver must honor additive evolution —
    including NESTED struct widening — exactly like the window fold
    (the halves meet in unionByName). Forced onto the broadcast path:
    the adaptive fraction rule would route these tiny waves to the
    window resolver."""
    import pyspark.sql.functions as F

    from transactional_datalake_using_apache_iceberg_on_aws_glue_spark.lake import (
        ParquetLakeTable,
    )

    t = ParquetLakeTable(spark, str(tmp_path / "be"), key_cols=["id"],
                         partition_col=None, allow_schema_evolution=True)
    t.BROADCAST_MERGE_MAX_FRACTION = 10.0
    t.create(spark.createDataFrame(
        [(1, (10, "x")), (2, (20, "y"))],
        "id long, payload struct<a:int,b:string>"))
    # batch widens the struct (new nested field c) AND adds a top-level
    # column; one matched update + one insert
    t.merge(spark.createDataFrame(
        [(2, (21, "y2", 2.5), "n2"), (3, (30, "z", 3.5), "n3")],
        "id long, payload struct<a:int,b:string,c:double>, note string")
        .withColumn("_op", F.lit("update"))
        .withColumn("_op_timestamp",
                    F.to_timestamp(F.lit("2026-05-01 00:00:00"))))
    got = {r["id"]: (r["payload"]["a"], r["payload"]["b"],
                     r["payload"]["c"], r["note"])
           for r in t.read_data().collect()}
    assert got == {
        1: (10, "x", None, None),   # old row: widened fields null-fill
        2: (21, "y2", 2.5, "n2"),
        3: (30, "z", 3.5, "n3"),
    }, got
    assert dict(t.read_data().dtypes)["payload"] == (
        "struct<a:int,b:string,c:double>")
    # and a batch MISSING a stored column null-fills it
    t.merge(spark.createDataFrame(
        [(4, (40, "w", None))],
        "id long, payload struct<a:int,b:string,c:double>")
        .withColumn("_op", F.lit("insert"))
        .withColumn("_op_timestamp",
                    F.to_timestamp(F.lit("2026-05-02 00:00:00"))))
    got4 = {r["id"]: r["note"] for r in t.read_data().collect()}
    assert got4[4] is None and set(got4) == {1, 2, 3, 4}
