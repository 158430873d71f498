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


def ensure_shipped(spark) -> None:
    """Ship this package to Python workers via ``addPyFile``.

    A harness that imports the engine from a path outside the workers'
    PYTHONPATH (e.g. a driver script running in its own directory) can
    execute JVM-only plans fine, but any Pandas-UDF/mapInPandas closure
    that references package code would fail to unpickle on the worker
    with ModuleNotFoundError. Zipping the package once per SparkContext
    and registering it with ``addPyFile`` is the standard Spark way to
    ship library code at runtime — identical to cluster deployment.
    """
    sc = spark.sparkContext
    if getattr(sc, "_adps_pkg_shipped", False):
        return
    import os
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    base = os.path.join(
        tempfile.gettempdir(), f"adps_pkg_{os.getpid()}_{abs(hash(pkg_dir)) % 99999}"
    )
    zip_path = shutil.make_archive(
        base, "zip", root_dir=os.path.dirname(pkg_dir), base_dir=os.path.basename(pkg_dir)
    )
    sc.addPyFile(zip_path)
    sc._adps_pkg_shipped = True
