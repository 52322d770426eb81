"""Catalog dispatch contract (round-3 task 6): the parquet form runs on
every build already (append_manifest/read_manifest route through
tables_for); this file pins the dispatch rules and drives the
IcebergTables code path against a RECORDING FAKE of the Spark surface
it uses — no Iceberg jar exists in this sandbox, so the contract test
is what keeps that branch from being dead code. The real-run recipe is
in IcebergTables' docstring."""

import pytest

from mantic_sh_spark.sources.catalog import IcebergTables, ParquetTables, tables_for


class _FakeWriteTo:
    def __init__(self, log, ident):
        self.log, self.ident = log, ident
        self._using = None

    def using(self, fmt):
        self._using = fmt
        return self

    def append(self):
        self.log.append(("append", self.ident, self._using))

    def create(self):
        self.log.append(("create", self.ident, self._using))

    def createOrReplace(self):
        self.log.append(("createOrReplace", self.ident, self._using))


class _FakeDF:
    def __init__(self, log):
        self.log = log

    def writeTo(self, ident):
        return _FakeWriteTo(self.log, ident)

    def createOrReplaceTempView(self, name):
        self.log.append(("tempView", name))


class _FakeCatalog:
    def __init__(self, existing):
        self.existing = existing

    def tableExists(self, ident):
        return ident in self.existing


class _FakeSpark:
    def __init__(self, existing=()):
        self.log = []
        self.catalog = _FakeCatalog(set(existing))

    def table(self, ident):
        self.log.append(("table", ident))
        return f"<df:{ident}>"

    def sql(self, stmt):
        self.log.append(("sql", stmt))


def test_dispatch_rules(spark, tmp_path):
    assert isinstance(tables_for(spark, str(tmp_path)), ParquetTables)
    t = tables_for(spark, "iceberg://ice.search.myidx")
    assert isinstance(t, IcebergTables)
    assert t.ident("build_manifest") == "ice.search.myidx_build_manifest"
    with pytest.raises(ValueError, match="iceberg://"):
        tables_for(spark, "iceberg://just_a_name")


def test_parquet_tables_round_trip(spark, tmp_path):
    import pandas as pd

    t = tables_for(spark, str(tmp_path / "idx"))
    assert t.read("build_manifest") is None  # missing → None, no crash
    df = spark.createDataFrame(pd.DataFrame({"x": [1, 2]}), "x long")
    t.append("build_manifest", df)
    t.append("build_manifest", df)
    assert t.read("build_manifest").count() == 4
    t.overwrite("build_manifest", df)
    assert t.read("build_manifest").count() == 2


def test_iceberg_tables_contract():
    """Call-shape contract for every IcebergTables operation: create on
    first append, append on subsequent, snapshot overwrite, MERGE INTO
    text, read-through-catalog with exists probe."""
    fs = _FakeSpark(existing={"ice.search.idx_tombstones"})
    t = IcebergTables(fs, "ice", "search", "idx")
    df = _FakeDF(fs.log)

    t.append("build_manifest", df)  # table absent → create(iceberg)
    t.append("tombstones", df)      # table exists → plain append
    t.overwrite("collection_stats", df)
    t.merge_into("docs", df, key="doc_id")

    assert ("create", "ice.search.idx_build_manifest", "iceberg") in fs.log
    assert ("append", "ice.search.idx_tombstones", None) in fs.log
    assert ("createOrReplace", "ice.search.idx_collection_stats", "iceberg") in fs.log
    merge_stmts = [s for op, s in [x for x in fs.log if x[0] == "sql"]]
    assert len(merge_stmts) == 1
    stmt = merge_stmts[0]
    assert stmt.startswith("MERGE INTO ice.search.idx_docs")
    assert "ON t.doc_id = s.doc_id" in stmt
    assert "WHEN MATCHED THEN UPDATE SET *" in stmt
    assert "WHEN NOT MATCHED THEN INSERT *" in stmt
    assert ("tempView", "src") in fs.log

    # reads: absent table → None (no spark.table call); present → table()
    assert t.read("docs") is None
    assert t.read("tombstones") == "<df:ice.search.idx_tombstones>"
    assert ("table", "ice.search.idx_tombstones") in fs.log


def test_write_small_parquet_atomic_swap(spark, tmp_path):
    """The fold-close one-row commit must never leave the table absent:
    a write lands dot-prefixed (invisible) then renames over the final
    name, so a reader always sees exactly the old or the new file."""
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    from mantic_sh_spark.sources.catalog import write_small_parquet

    path = str(tmp_path / "collection_stats")
    write_small_parquet(
        spark, path, pd.DataFrame({"n_docs": pd.array([10], dtype="int64")}),
        "n_docs long")
    visible = [f for f in os.listdir(path) if not f.startswith((".", "_"))]
    assert visible == ["part-00000.parquet"]
    # overwrite swaps in place: still one visible file, new value, both
    # reader stacks (Spark + pyarrow — serve.py reads via pq.read_table)
    write_small_parquet(
        spark, path, pd.DataFrame({"n_docs": pd.array([20], dtype="int64")}),
        "n_docs long")
    assert [r.n_docs for r in spark.read.parquet(path).collect()] == [20]
    assert pq.read_table(path).to_pydict()["n_docs"] == [20]
    visible = [f for f in os.listdir(path) if not f.startswith((".", "_"))]
    assert visible == ["part-00000.parquet"]
    # a stale tmp from a crash-before-rename is invisible to readers
    # and harmlessly overwritten by the next commit
    open(os.path.join(path, ".part-00000.parquet.tmp"), "wb").write(b"junk")
    assert pq.read_table(path).to_pydict()["n_docs"] == [20]
    write_small_parquet(
        spark, path, pd.DataFrame({"n_docs": pd.array([30], dtype="int64")}),
        "n_docs long")
    assert pq.read_table(path).to_pydict()["n_docs"] == [30]


def test_write_small_parquet_converges_legacy_spark_dir(spark, tmp_path):
    """A dir left by the old Spark-overwrite layout (uuid part names +
    _SUCCESS) converges to the single-file layout; the legacy parts are
    cleared only AFTER the new file is durable."""
    import os

    import pandas as pd

    from mantic_sh_spark.sources.catalog import write_small_parquet

    path = str(tmp_path / "format_version")
    spark.createDataFrame(
        pd.DataFrame({"v": pd.array([4], dtype="int32")}), "v int"
    ).coalesce(1).write.mode("overwrite").parquet(path)
    write_small_parquet(
        spark, path, pd.DataFrame({"v": pd.array([5], dtype="int32")}), "v int")
    assert [r.v for r in spark.read.parquet(path).collect()] == [5]
    visible = [f for f in os.listdir(path) if not f.startswith((".", "_"))]
    assert visible == ["part-00000.parquet"]
