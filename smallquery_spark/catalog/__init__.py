from smallquery_spark.catalog.workspace import (
    VersionedCatalog,
    Workspace,
    sanitize_path,
)

__all__ = ["VersionedCatalog", "Workspace", "sanitize_path"]
