"""PySpark-native analytics engine with the query/data-processing surface of
celinerobi/ast-data-pipeline (see SURVEY.md), re-expressed Spark-first.

Layout:
  session    — SparkSession factory tuned for local[32] and cluster scale
  registry   — query registry: name -> (spark callable, duckdb oracle sql)
  sources/   — table catalog + readers/sinks
  functions/ — scalar column-expression builders (SURVEY §2.2 P1..P22)
  operators/ — joins/aggregates/windows/setops/merge/spatial/dedup/... (§2.3-§2.10)
  plans/     — composed pipelines mirroring the reference drivers (§3)
  streaming/ — Structured Streaming variants of the work-queue (§2.9)
  queries/   — registered, oracle-checked query surface (driver contract)
"""

__version__ = "0.1.0"
