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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    DataSourceWriter,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.pandas.types import from_arrow_schema


def _tagcommit(options) -> bool:
    return str(options.get("tagcommit", "")).lower() == "true"


class _Slice(InputPartition):
    def __init__(self, path: str, row_group: int | None, commit: str | None = None):
        self.path = path
        self.row_group = row_group
        self.commit = commit


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
        self._commit = None
        if _tagcommit(options):
            from smallquery_spark.catalog import VersionedCatalog

            ws = VersionedCatalog(options.get("mount")).workspace(
                options.get("workspace")
            )
            self._commit = ws.resolve_version(options.get("version") or "latest")

    def partitions(self):
        if self.path.endswith(".parquet"):
            import pyarrow.parquet as pq

            n = pq.ParquetFile(self.path).num_row_groups
            return [_Slice(self.path, g, self._commit) for g in range(max(n, 1))]
        return [_Slice(self.path, None, self._commit)]

    def read(self, partition: _Slice) -> Iterator:
        """Executor-side: yield arrow batches for one slice."""
        if partition.path.endswith(".parquet"):
            import pyarrow.parquet as pq

            pf = pq.ParquetFile(partition.path)
            if pf.num_row_groups == 0:
                return
            tbl = pf.read_row_group(partition.row_group)
        else:
            import pyarrow.csv as pacsv

            tbl = pacsv.read_csv(partition.path)
        if partition.commit is not None:
            import pyarrow as pa

            tbl = tbl.append_column(
                "commit", pa.array([partition.commit] * len(tbl), pa.string())
            )
        yield from tbl.to_batches()


class GitWorkspaceDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "gitws"

    def schema(self):
        from pyspark.sql.types import StringType, StructField, StructType

        path = _resolve(self.options)
        if path.endswith(".parquet"):
            import pyarrow.parquet as pq

            base = from_arrow_schema(pq.ParquetFile(path).schema_arrow)
        else:
            import pyarrow.csv as pacsv

            base = from_arrow_schema(pacsv.read_csv(path).schema)
        if _tagcommit(self.options):
            return StructType(
                list(base.fields) + [StructField("commit", StringType())]
            )
        return base

    def reader(self, schema):
        return GitWorkspaceReader(self.options, schema)

    def simpleStreamReader(self, schema):
        return GitWorkspaceStreamReader(self.options, schema)

    def writer(self, schema, overwrite: bool):
        return GitWorkspaceWriter(self.options, schema, overwrite)


class GitWorkspaceStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of ``gitws``: replay a table's COMMIT HISTORY.

    Each micro-batch emits the full table content at every new commit
    (oldest → newest along first-parent history) — a change-feed over
    versioned transformations; with ``option("tagcommit", "true")`` each
    row is tagged with its commit id (matching ``schema()``, which only
    declares the ``commit`` column then — ADVICE r1 arity fix). Offsets
    are the count of commits already emitted, so restarts resume
    exactly: replay after a failure re-reads commits[start:end], never
    beyond the recorded end offset (ADVICE r1 readBetweenOffsets fix).
    """

    def __init__(self, options, schema):
        # hold only plain strings: the reader is cloudpickled to workers
        # and Workspace carries a thread lock.
        self.mount = options.get("mount")
        self.workspace = options.get("workspace")
        self.table = options.get("table")
        self.tagcommit = _tagcommit(options)
        self._schema = schema

    def _ws(self):
        from smallquery_spark.catalog import VersionedCatalog

        return VersionedCatalog(self.mount).workspace(self.workspace)

    def _history(self) -> list[str]:
        from smallquery_spark.catalog.workspace import _git

        out = _git(
            self._ws().repo_dir, "log", "--first-parent", "--reverse",
            "--format=%H",
        )
        return [c for c in out.splitlines() if c]

    def initialOffset(self) -> dict:
        return {"n": 0}

    def _rows_for(self, commits: list[str]) -> list[tuple]:
        ws = self._ws()
        rows: list[tuple] = []
        for commit in commits:
            try:
                path = ws.table_path(self.table, commit)
            except Exception:
                continue  # table absent at this commit
            if path.endswith(".parquet"):
                import pyarrow.parquet as pq

                tbl = pq.read_table(path)
            else:
                import pyarrow.csv as pacsv

                tbl = pacsv.read_csv(path)
            for rec in tbl.to_pylist():
                row = tuple(rec.values())
                rows.append(row + (commit,) if self.tagcommit else row)
        return rows

    def read(self, start: dict):
        commits = self._history()
        return iter(self._rows_for(commits[start["n"]:])), {"n": len(commits)}

    def readBetweenOffsets(self, start: dict, end: dict):
        commits = self._history()
        return iter(self._rows_for(commits[start["n"] : end["n"]]))

    def commit(self, end: dict) -> None:
        pass


class _PartRows(WriterCommitMessage):
    def __init__(self, rows):
        self.rows = rows


class GitWorkspaceWriter(DataSourceWriter):
    """Write half of ``gitws``: ``df.write.format("gitws")`` commits the
    DataFrame as a NEW VERSION of the table in the workspace repo.

    Executors serialize their partitions into commit messages; the
    driver-side commit() assembles them, writes the table CSV into the
    worktree and creates the git commit (optionally tagged via
    option("tag", ...)). Result tables at this surface are small
    (post-aggregation); bulk data belongs in parquet outside git.
    """

    def __init__(self, options, schema, overwrite: bool):
        self.mount = options.get("mount")
        self.workspace = options.get("workspace")
        self.table = options.get("table")
        self.message = options.get("message") or f"write {self.table}"
        self.tag = options.get("tag")
        if not (self.mount and self.workspace and self.table):
            raise ValueError("gitws write requires options: mount, workspace, table")
        self.schema = schema

    def write(self, iterator) -> "_PartRows":
        return _PartRows([tuple(r) for r in iterator])

    def commit(self, messages) -> None:
        import pyarrow as pa
        import pyarrow.csv as pacsv

        from smallquery_spark.catalog import VersionedCatalog
        from smallquery_spark.catalog.workspace import _git, sanitize_path

        ws = VersionedCatalog(self.mount).workspace(self.workspace)
        names = [f.name for f in self.schema.fields]
        rows = [r for m in messages for r in m.rows]
        cols = list(zip(*rows)) if rows else [[] for _ in names]
        tbl = pa.table({n: list(c) for n, c in zip(names, cols)})
        rel = sanitize_path(f"{self.table}.csv")
        path = os.path.join(ws.repo_dir, rel)
        pacsv.write_csv(tbl, path)
        # stage ONLY the written table (never sweep stray worktree files
        # into the data version — ADVICE r1); --allow-empty keeps the
        # "every write creates a version" contract when content repeats.
        _git(ws.repo_dir, "add", "--", rel)
        # commit() runs in a data-source Python worker whose env has no
        # git identity — pass one explicitly.
        _git(
            ws.repo_dir,
            "-c", "user.name=smallquery",
            "-c", "user.email=engine@smallquery",
            "commit", "--allow-empty", "-m", self.message,
        )
        if self.tag:
            _git(ws.repo_dir, "tag", self.tag)

    def abort(self, messages) -> None:
        pass
