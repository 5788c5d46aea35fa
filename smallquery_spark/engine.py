"""The engine facade.

Three entry points mirroring the reference's lifecycle (SURVEY.md §3.4):

1. ``engine.sql(query, workspace=..., version=...)`` — resolve versioned
   tables, register temp views, hand the query to Catalyst.
2. ``engine.table(name)`` — DataFrame-builder entry; thin resolution then
   plain PySpark DataFrame.
3. ``engine.stream(name)`` — Structured Streaming entry (see
   smallquery_spark.streaming).

Version resolution happens driver-side *before* planning (SURVEY.md
§4.3): Spark never sees the git layer, only an immutable snapshot
directory, so all built-in optimizations apply unchanged.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from smallquery_spark.catalog import VersionedCatalog
from smallquery_spark.catalog.workspace import LATEST
from smallquery_spark.sources import read_any

# `table@version` spelling inside engine.sql() queries.
_AT_VERSION = re.compile(r"\b([A-Za-z_][A-Za-z0-9_]*)@([A-Za-z0-9_./-]+)\b")
# Delta/Iceberg-style time travel: `FROM tbl VERSION AS OF 'ref'`.
_VERSION_AS_OF = re.compile(
    r"\b([A-Za-z_][A-Za-z0-9_]*)\s+VERSION\s+AS\s+OF\s+'([^']+)'",
    re.IGNORECASE,
)


class Engine:
    """A SparkSession bound to an optional workspace mount."""

    def __init__(self, spark: SparkSession, workspace_mount: str | None = None):
        self.spark = spark
        self.catalog = VersionedCatalog(workspace_mount) if workspace_mount else None

    # -- resolution --------------------------------------------------------

    def _require_catalog(self) -> VersionedCatalog:
        if self.catalog is None:
            raise ValueError("engine created without a workspace mount")
        return self.catalog

    def table(
        self,
        name: str,
        workspace: str | None = None,
        version: str = LATEST,
    ) -> DataFrame:
        """Load a (possibly versioned) table as a DataFrame.

        With a workspace: resolve ``version`` (git ref → commit, reference
        http_server.rs:154-165), materialize the snapshot, read the
        table's file. Without: read ``name`` as a plain path.
        """
        if workspace is not None:
            ws = self._require_catalog().workspace(workspace)
            path = ws.table_path(name, version)
            return read_any(self.spark, path)
        return read_any(self.spark, name)

    # -- SQL entry ---------------------------------------------------------

    def sql(
        self,
        query: str,
        workspace: str | None = None,
        version: str = LATEST,
        tables: dict[str, str] | None = None,
    ) -> DataFrame:
        """Run SQL against versioned workspace tables.

        ``table@version`` references in the query are resolved through the
        workspace catalog and rewritten to registered temp views before
        Catalyst sees the text. Plain table names are resolved at
        ``version`` (default ``latest`` = HEAD, reference
        http_server.rs:106-110) when a workspace is given, or must already
        be registered views otherwise. ``tables`` maps extra view names to
        concrete paths.
        """
        for name, path in (tables or {}).items():
            read_any(self.spark, path).createOrReplaceTempView(name)

        if workspace is not None:
            ws = self._require_catalog().workspace(workspace)

            def _sub(m: re.Match) -> str:
                tbl, ver = m.group(1), m.group(2)
                view = f"{tbl}__{re.sub(r'[^A-Za-z0-9_]', '_', ver)}"
                df = read_any(self.spark, ws.table_path(tbl, ver))
                df.createOrReplaceTempView(view)
                return view

            query = _VERSION_AS_OF.sub(lambda m: _sub(m), query)
            query = _AT_VERSION.sub(_sub, query)
            # Register un-suffixed names present in the snapshot at `version`.
            snap_tables = self._snapshot_tables(ws, version)
            referenced = set(re.findall(r"\b[A-Za-z_][A-Za-z0-9_]*\b", query))
            for tbl, path in snap_tables.items():
                if tbl in referenced:
                    read_any(self.spark, path).createOrReplaceTempView(tbl)
        return self.spark.sql(query)

    @staticmethod
    def _snapshot_tables(ws, version: str) -> dict[str, str]:
        import os

        snap = ws.snapshot(version)
        out: dict[str, str] = {}
        for dirpath, _dirnames, filenames in os.walk(snap):
            for fn in filenames:
                base, ext = os.path.splitext(fn)
                if ext.lower() in (".parquet", ".csv", ".json", ".jsonl"):
                    out.setdefault(base, os.path.join(dirpath, fn))
        return out

    # -- write entry -------------------------------------------------------

    def write_table(
        self,
        df: DataFrame,
        table: str,
        workspace: str,
        message: str,
        tag: str | None = None,
    ) -> str:
        """Commit ``df`` as a new version of ``table`` in ``workspace``;
        returns the commit id (see catalog.workspace.write_table_version)."""
        from smallquery_spark.catalog.workspace import write_table_version

        ws = self._require_catalog().workspace(workspace)
        return write_table_version(ws, df, table, message, tag=tag)

    # -- streaming entry ---------------------------------------------------

    def stream(self, path: str, schema, fmt: str = "parquet") -> DataFrame:
        """Structured Streaming source over a directory (SURVEY B50)."""
        return self.spark.readStream.schema(schema).format(fmt).load(path)
