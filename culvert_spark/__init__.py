"""culvert_spark — a PySpark-native analytics & streaming-ingest engine.

Re-implements the capabilities of the reference engine (prasanthj/culvert,
a Hive streaming-ingest benchmark — see SURVEY.md) Spark-first:

- ``generator``  — deterministic synthetic-data generation (Column.java parity)
- ``ingest``     — rate-governed, partitioned, transactional table sinks
- ``queries``    — the relational operator library (joins/aggs/windows/...)
- ``textops``    — dedup / similarity-search / text-analysis operators
- ``streaming``  — Structured Streaming operators (windows, watermarks, state)
- ``session``    — SparkSession factory tuned for the target scale
- ``cli``        — CLI mirroring the reference's flags

Everything is expressed with the public DataFrame/SQL API so Catalyst
optimizes the plans (pushdown, pruning, AQE, whole-stage codegen).
"""

from culvert_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
