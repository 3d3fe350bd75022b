"""icelite schema evolution: manifests record each table's schema, reads
pin to the snapshot's schema (add-column → nulls over old files,
drop-column → projected away), and an illegal type change aborts the
commit before any data lands."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawlspark.icelite import IceliteCatalog
from crawlspark.icelite.table import SchemaEvolutionError

V1 = T.StructType(
    [
        T.StructField("a", T.LongType()),
        T.StructField("b", T.StringType()),
    ]
)
V2 = T.StructType(V1.fields + [T.StructField("c", T.DoubleType())])
V3 = T.StructType([f for f in V2.fields if f.name != "b"])  # drop b
BAD = T.StructType(
    [
        T.StructField("a", T.LongType()),
        T.StructField("b", T.StringType()),
        T.StructField("c", T.StringType()),  # c changed double -> string
    ]
)


def test_add_and_drop_column_over_by_reference_files(spark, tmp_path):
    cat = IceliteCatalog(str(tmp_path / "cat"))
    d1 = str(tmp_path / "part1")
    spark.createDataFrame([(1, "x"), (2, "y")], V1).write.parquet(d1)
    cat.commit({"t": [d1]}, meta={}, schemas={"t": V1})

    # add column c: old files must read back with c = null
    d2 = str(tmp_path / "part2")
    spark.createDataFrame([(3, "z", 1.5)], V2).write.parquet(d2)
    cat.commit({"t": [d1, d2]}, meta={}, schemas={"t": V2})
    rows = {
        r["a"]: (r["b"], r["c"])
        for r in cat.load(spark, cat.latest(), "t").collect()
    }
    assert rows == {1: ("x", None), 2: ("y", None), 3: ("z", 1.5)}

    # drop column b: projected away from EVERY file, old and new
    cat.commit({"t": [d1, d2]}, meta={}, schemas={"t": V3})
    df = cat.load(spark, cat.latest(), "t")
    assert df.columns == ["a", "c"]
    assert df.count() == 3

    # an untouched append inherits the read schema (no silent reset)
    cat.commit({"t": [d1, d2]}, meta={})
    assert cat.load(spark, cat.latest(), "t").columns == ["a", "c"]


def test_type_change_aborts_before_data_lands(spark, tmp_path):
    cat = IceliteCatalog(str(tmp_path / "cat"))
    d1 = str(tmp_path / "part1")
    spark.createDataFrame([(1, "x", 0.5)], V2).write.parquet(d1)
    cat.commit({"t": [d1]}, meta={}, schemas={"t": V2})
    bad_df = spark.createDataFrame([(9, "q", "oops")], BAD)
    with pytest.raises(SchemaEvolutionError):
        cat.commit({"t": bad_df}, meta={})
    # previous snapshot intact, and the aborted commit wrote NO data dir
    snap = cat.latest()
    assert snap.snapshot_id == 0
    assert not os.path.isdir(os.path.join(cat.root, "data", "snap-000001"))


def test_rollback_restores_pre_evolution_schema(spark, tmp_path):
    """Time-travel reads see the schema AS OF the snapshot — rollback
    past an add-column must drop the column again."""
    cat = IceliteCatalog(str(tmp_path / "cat"))
    d1 = str(tmp_path / "part1")
    spark.createDataFrame([(1, "x")], V1).write.parquet(d1)
    s0 = cat.commit({"t": [d1]}, meta={}, schemas={"t": V1})
    d2 = str(tmp_path / "part2")
    spark.createDataFrame([(2, "y", 2.5)], V2).write.parquet(d2)
    cat.commit({"t": [d1, d2]}, meta={}, schemas={"t": V2})
    assert cat.load(spark, cat.latest(), "t").columns == ["a", "b", "c"]
    cat.rollback(s0.snapshot_id)
    assert cat.load(spark, cat.latest(), "t").columns == ["a", "b"]


def test_lineage_df_reports_per_file_rows_and_added_flags(spark, tmp_path):
    """lineage_df turns the manifest into a queryable per-file frame:
    rows/bytes accounted per data file, `added` true exactly for files
    first referenced by this snapshot."""
    cat = IceliteCatalog(str(tmp_path / "cat"))
    d1 = str(tmp_path / "p1")
    spark.createDataFrame([(1, "x"), (2, "y")], V1).write.parquet(d1)
    cat.commit({"t": [d1]}, meta={}, schemas={"t": V1})
    d2 = str(tmp_path / "p2")
    spark.createDataFrame([(3, "z")], V1).write.parquet(d2)
    snap = cat.commit({"t": [d1, d2]}, meta={}, schemas={"t": V1})
    lin = cat.lineage_df(spark, snap)
    rows = lin.collect()
    assert {r["table"] for r in rows} == {"t"}
    assert sum(r["rows"] for r in rows) == 3
    assert all(r["bytes"] > 0 for r in rows)
    # files from d1 pre-existed (added=False); exactly d2's files are new
    by_added = {r["added"] for r in rows}
    assert by_added == {True, False}
    assert all(("/p2/" in r["file"]) == r["added"] for r in rows)
    assert all(r["snapshot_id"] == snap.snapshot_id for r in rows)


def test_type_widening_int_to_long_and_float_to_double(spark, tmp_path):
    """Iceberg's legal promotions: existing int32/float32 files read back
    correctly under the widened snapshot schema."""
    cat = IceliteCatalog(str(tmp_path / "cat"))
    narrow = T.StructType(
        [
            T.StructField("a", T.IntegerType()),
            T.StructField("x", T.FloatType()),
        ]
    )
    wide = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("x", T.DoubleType()),
        ]
    )
    d1 = str(tmp_path / "p1")
    spark.createDataFrame([(7, 1.5)], narrow).write.parquet(d1)
    cat.commit({"t": [d1]}, meta={}, schemas={"t": narrow})
    cat.commit({"t": [d1]}, meta={}, schemas={"t": wide})
    df = cat.load(spark, cat.latest(), "t")
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["bigint", "double"]
    row = df.collect()[0]
    assert row["a"] == 7 and abs(row["x"] - 1.5) < 1e-9
    # narrowing back is NOT legal
    import pytest as _pytest

    with _pytest.raises(SchemaEvolutionError):
        cat.commit({"t": [d1]}, meta={}, schemas={"t": narrow})
