"""smallquery_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference workspace-query server (see SURVEY.md): versioned-workspace
tables (git-backed snapshots), a full relational operator surface
expressed through Spark SQL / DataFrame / Catalyst, Structured
Streaming over event tables, and LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) designed for
100 TB scale.

Everything here is idiomatic PySpark: logical plans are declared with
the DataFrame/SQL API and Catalyst + Tungsten pick the physical
strategy. Python-side execution (Pandas UDFs) is reserved for
semantics the built-in operators genuinely cannot express.
"""

from smallquery_spark.session import get_session, stop_session
from smallquery_spark.engine import Engine
from smallquery_spark.errors import (
    EngineError,
    PathNotFound,
    VersionNotFound,
    WorkspaceNotFound,
)

__all__ = [
    "Engine",
    "EngineError",
    "PathNotFound",
    "VersionNotFound",
    "WorkspaceNotFound",
    "get_session",
    "stop_session",
]

__version__ = "0.1.0"
