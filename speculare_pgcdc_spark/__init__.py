"""speculare-pgcdc-spark — a PySpark-native analytics/streaming engine.

Re-expresses the query and data-processing capabilities of the reference
CDC service (speculare-cloud/speculare-pgcdc, a Rust wal2json->WebSocket
forwarder) as an idiomatic Spark engine:

- Layer 1 (reference-equivalent): Structured-Streaming CDC pipeline —
  wal2json envelope model, subscription DSL compiled to Column predicates,
  routed fan-out sink, checkpointed offsets (the LSN analog).
- Layer 2 (engine surface): the full relational operator inventory of
  SURVEY.md §2B implemented with DataFrame/SQL/Catalyst, verified against
  a DuckDB oracle, plus LLM-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal columns) designed for 100 TB scale.

Everything here is public-knowledge PySpark; no code is copied from the
reference (which is Rust and a different execution model entirely).
"""

__version__ = "0.1.0"

from speculare_pgcdc_spark.session import get_spark  # noqa: F401
from speculare_pgcdc_spark.catalog import TABLES, table, register_views  # noqa: F401
