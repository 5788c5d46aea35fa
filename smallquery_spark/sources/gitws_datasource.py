"""`gitws` — a Spark 4 Python Data Source for versioned workspace tables.

Realizes SURVEY.md §4.3's deferred "DataSourceV2 TableProvider honoring
VERSION AS OF" as a first-class Spark source: after
``spark.dataSource.register(GitWorkspaceDataSource)``,

    spark.read.format("gitws")
        .option("mount", "workspaces/")
        .option("workspace", "sales")
        .option("table", "nation")
        .option("version", "v1")       # git ref / commit prefix / latest
        .load()

resolves the version through the same ``VersionedCatalog`` (reference
semantics: ref-name before commit-prefix, http_server.rs:154-165),
materializes the snapshot, and serves the table's rows.

Execution shape: version resolution happens DRIVER-side at planning
(schema() / partitions()); executors receive only (snapshot file path,
row-group slice) partitions and read with pyarrow — so reads scale out
per row-group like a native parquet scan. CSV snapshots read as one
partition (header files don't split safely without an index).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.pandas.types import from_arrow_schema


class _Slice(InputPartition):
    def __init__(self, path: str, row_group: int | None):
        self.path = path
        self.row_group = row_group


def _resolve(options) -> str:
    """Driver-side: (mount, workspace, table, version) → concrete file."""
    from smallquery_spark.catalog import VersionedCatalog

    mount = options.get("mount")
    workspace = options.get("workspace")
    table = options.get("table")
    version = options.get("version") or "latest"
    if not (mount and workspace and table):
        raise ValueError("gitws requires options: mount, workspace, table")
    ws = VersionedCatalog(mount).workspace(workspace)
    return ws.table_path(table, version)


class GitWorkspaceReader(DataSourceReader):
    def __init__(self, options, schema):
        self.path = _resolve(options)
        self._schema = schema

    def partitions(self):
        if self.path.endswith(".parquet"):
            import pyarrow.parquet as pq

            n = pq.ParquetFile(self.path).num_row_groups
            return [_Slice(self.path, g) for g in range(max(n, 1))]
        return [_Slice(self.path, None)]

    def read(self, partition: _Slice) -> Iterator:
        """Executor-side: yield arrow batches for one slice."""
        if partition.path.endswith(".parquet"):
            import pyarrow.parquet as pq

            pf = pq.ParquetFile(partition.path)
            if pf.num_row_groups == 0:
                return
            yield from pf.read_row_group(partition.row_group).to_batches()
        else:
            import pyarrow.csv as pacsv

            yield from pacsv.read_csv(partition.path).to_batches()


class GitWorkspaceDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "gitws"

    def schema(self):
        path = _resolve(self.options)
        if path.endswith(".parquet"):
            import pyarrow.parquet as pq

            return from_arrow_schema(pq.ParquetFile(path).schema_arrow)
        import pyarrow.csv as pacsv

        return from_arrow_schema(pacsv.read_csv(path).schema)

    def reader(self, schema):
        return GitWorkspaceReader(self.options, schema)
