"""agent_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ELT pipeline (gittium/Agent-Data-Pipeline, surveyed in SURVEY.md),
re-expressed Spark-first: declarative DataFrame/SQL plans optimized by
Catalyst, Structured Streaming for streams, and Arrow-vectorized Pandas UDFs
only where built-ins cannot express the semantics.

Modules
-------
session     SparkSession factory tuned for local[32] dev and cluster scale.
io          Sources (CSV/Parquet/JSON/JDBC) and sinks, testdata loaders.
schema      Sampled schema inference, diff, additive evolution (reference
            agent-schema parity; /root/reference/agent-schema/app.py).
ops         Relational operator library: scalar expression helpers with
            reference-exact semantics, top-k, as-of joins, sessionization.
pipelines   Reference-parity pipelines (taxi ingest/transform/summary).
streaming   Structured Streaming jobs mirroring the batch operators.
llmdata     LLM-training-data operators: dedup (exact/MinHash/SimHash),
            embedding similarity search, text analysis, multimodal columns.
queries     The engine's query registry: every operator exposed as a
            (spark_fn, oracle_sql) pair used by __spark_entry__.py.
"""

__version__ = "0.1.0"
