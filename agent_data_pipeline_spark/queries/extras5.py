"""Round-2 surface extensions, part 5: the Spark-4 Python DataSource
extension point (a user-defined partition-parallel source), plus the
remaining complex-type surface (struct carriage, map kit 2, regex kit,
null-preserving explode).

The Python DataSource is the headline here: it is Spark's public API
for bolting arbitrary systems (feeds, fake data, bespoke file formats)
into the scan side of Catalyst with real InputPartitions — each
partition reads independently on an executor, so a synthetic or remote
source scales out exactly like a file scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import QuerySpec, rnd, t

try:  # Spark 4 API; gate so module import survives older runtimes
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    _HAVE_DATASOURCE = True
except ImportError:  # pragma: no cover
    _HAVE_DATASOURCE = False


# --- Python DataSource: deterministic synthetic range source ---------------

if _HAVE_DATASOURCE:

    class _RangePart(InputPartition):
        def __init__(self, start: int, end: int):
            self.start, self.end = start, end

    class _SynthReader(DataSourceReader):
        """Partition-parallel deterministic generator: id, bucket=id%7,
        and a hash-derived two-decimal value carried as exact cents."""

        def __init__(self, options):
            self.n = int(options.get("n", 10000))
            self.parts = int(options.get("parts", 8))

        def partitions(self):
            step = max(1, self.n // self.parts)
            bounds = list(range(0, self.n, step))
            return [
                _RangePart(s, self.n if i == len(bounds) - 1 else s + step)
                for i, s in enumerate(bounds)
            ]

        def read(self, part):
            for i in range(part.start, part.end):
                yield (i, i % 7, (i * 2654435761) % 997)

    class SynthRangeSource(DataSource):
        """`synthrange` format: the engine's reference implementation of
        the Spark 4 Python DataSource API (partition-planned, executor-
        side reads)."""

        @classmethod
        def name(cls):
            return "synthrange"

        def schema(self):
            return "id bigint, bucket bigint, cents bigint"

        def reader(self, schema):
            return _SynthReader(self.options)


_PYDS_SQL = """
SELECT i % 7 AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(i) AS BIGINT) AS sum_id,
       floor(sum((i * 2654435761) % 997) / 100.0 * 100 + 0.5) / 100 AS sum_val
FROM generate_series(0, 9999) g(i)
GROUP BY i % 7
"""


def _python_datasource_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Register + scan the custom Python DataSource and aggregate it.
    The oracle regenerates the same rows with generate_series — the
    match proves the source's partition planning covers [0, n) exactly
    once with no seams or duplicates across InputPartitions."""
    spark.dataSource.register(SynthRangeSource)
    df = spark.read.format("synthrange").option("n", 10000).option("parts", 8).load()
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("id").cast("long").alias("sum_id"),
        rnd(F.sum("cents") / F.lit(100.0), 2).alias("sum_val"),
    )


# --- Struct carriage: arrays_zip + posexplode ------------------------------

_STRUCT_KIT_SQL = """
SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
       floor(emb[i] * 10000 + 0.5) / 10000 AS fwd,
       floor(rev[i] * 10000 + 0.5) / 10000 AS bwd
FROM (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
             list_reverse(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS rev
      FROM embeddings),
     generate_series(1, 4) g(i)
"""


def _struct_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction and flattening: arrays_zip pairs two aligned
    arrays into an array<struct>, posexplode unpacks it with ordinal,
    getField projects the members back out. Structs ride through
    Tungsten as packed rows — carrying (fwd, bwd) pairs costs no more
    than two flat columns."""
    e = t(spark, sf_dir, "embeddings")
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    zipped = F.arrays_zip(
        F.slice(emb, 1, 4).alias("fwd"), F.slice(F.reverse(emb), 1, 4).alias("bwd")
    )
    ex = e.select("vec_id", F.posexplode(zipped).alias("pos", "pair"))
    return ex.select(
        "vec_id",
        F.col("pos").cast("long").alias("pos"),
        rnd(F.col("pair").getField("fwd"), 4).alias("fwd"),
        rnd(F.col("pair").getField("bwd"), 4).alias("bwd"),
    )


# --- Map kit 2: keys/values/element_at/contains/concat ---------------------

_MAP_KIT2_SQL = """
SELECT event_id,
       array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted,
       m['type'][1]                              AS type_val,
       m['uid'][1]                               AS uid_val,
       list_contains(map_keys(m), 'type')        AS has_type,
       CAST(cardinality(m2) AS BIGINT)           AS n_after_concat
FROM (SELECT event_id,
             MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}  AS m,
             MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR),
                  'day': strftime(ts, '%Y-%m-%d')}                       AS m2
      FROM events)
"""


def _map_kit2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map surface beyond construction+explode (map_explode_metrics):
    map_keys, element_at lookups, key membership, map_concat growth —
    the property-bag idiom for sparse per-event attributes. keys_sorted
    is emitted as a joined string: scalar results canonicalize
    identically across engines, array columns don't."""
    ev = t(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    m2 = F.map_concat(
        m, F.create_map(F.lit("day"), F.date_format(F.col("ts").cast("timestamp_ntz"), "yyyy-MM-dd"))
    )
    return ev.select(
        "event_id",
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(m, "type").alias("type_val"),
        F.element_at(m, "uid").alias("uid_val"),
        F.array_contains(F.map_keys(m), "type").alias("has_type"),
        F.size(F.map_keys(m2)).cast("long").alias("n_after_concat"),
    )


# --- Regex kit --------------------------------------------------------------

_REGEX_KIT_SQL = """
SELECT p_partkey,
       CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS BIGINT) AS n_vowel_runs,
       regexp_extract_all(p_name, '[aeiou]+')[1]                   AS first_vowel_run,
       regexp_replace(p_name, '[aeiou]+', '*', 'g')                AS starred,
       CAST(len(string_split_regex(p_name, '[aeiou]+')) AS BIGINT) AS n_consonant_spans,
       regexp_matches(p_name, '^[a-z]+ ')                          AS starts_word
FROM part
"""


def _regex_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface: extract-all, global replace, regex split, anchored
    match. All JVM-side (java.util.regex) — the scale path for pattern
    features is these builtins, not Python re in a UDF."""
    p = t(spark, sf_dir, "part")
    runs = F.regexp_extract_all(F.col("p_name"), F.lit("[aeiou]+"), 0)
    return p.select(
        "p_partkey",
        F.size(runs).cast("long").alias("n_vowel_runs"),
        F.element_at(runs, 1).alias("first_vowel_run"),
        F.regexp_replace(F.col("p_name"), "[aeiou]+", "*").alias("starred"),
        F.size(F.split(F.col("p_name"), "[aeiou]+")).cast("long").alias("n_consonant_spans"),
        F.col("p_name").rlike("^[a-z]+ ").alias("starts_word"),
    )


# --- Null-preserving explode ------------------------------------------------

_EXPLODE_OUTER_SQL = """
SELECT d.doc_id, u.tok
FROM (SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN []
                  ELSE string_split(text, ' ')[1:2] END AS toks
      FROM documents) d
LEFT JOIN LATERAL unnest(d.toks) u(tok) ON true
ORDER BY d.doc_id, u.tok
"""


def _explode_outer_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows with empty arrays survive with a NULL element
    (plain explode silently drops them — the classic lost-document bug
    in tokenize-then-flatten pipelines). Oracle: LEFT JOIN LATERAL
    unnest, SQL's spelling of the same null-preserving semantics."""
    d = t(spark, sf_dir, "documents")
    toks = F.when(F.col("doc_id") % 3 == 0, F.array().cast("array<string>")).otherwise(
        F.slice(F.split(F.col("text"), " "), 1, 2)
    )
    return (
        d.select("doc_id", toks.alias("toks"))
        .select("doc_id", F.explode_outer("toks").alias("tok"))
        .orderBy("doc_id", "tok")
    )


QUERIES: dict[str, QuerySpec] = {
    "struct_kit": QuerySpec(_struct_kit, _STRUCT_KIT_SQL, "arrays_zip/posexplode/getField"),
    "map_kit2": QuerySpec(_map_kit2, _MAP_KIT2_SQL, "map keys/element_at/contains/concat"),
    "regex_kit": QuerySpec(_regex_kit, _REGEX_KIT_SQL, "extract-all/global replace/regex split"),
    "explode_outer_kit": QuerySpec(
        _explode_outer_kit, _EXPLODE_OUTER_SQL, "null-preserving explode"
    ),
}

if _HAVE_DATASOURCE:
    QUERIES["python_datasource_agg"] = QuerySpec(
        _python_datasource_agg, _PYDS_SQL, "Spark-4 Python DataSource partition-parallel scan"
    )
