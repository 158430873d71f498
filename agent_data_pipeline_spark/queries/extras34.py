"""Round-6 seventh wave: composed entity resolution — the full
blocking → scoring → transitive closure → golden record workflow as
ONE registry query, the way `training_data_prep` composes the LLM-data
stages. Each stage already exists as an audited primitive
(`blocked_name_candidates`, `connected_components`, min-key golden
records); this row proves the composition end-to-end against a single
declarative oracle.

``entity_resolution_pipeline`` semantics:
  1. Entities = DISTINCT part names (the fixture's name vocabulary is
     generator-bounded — 64 types at sf0.01 over 2,000 parts — so every
     later stage is vocabulary-bounded at ANY scale; real deployments
     get the same effect from normalization + blocking).
  2. Candidate edges: dual-key blocking (first ∪ last token) exactly as
     `fuzzy_part_match`, scored by exact Levenshtein, matched at ≤ 4.
  3. Clusters: connected components over matched name pairs (node id =
     the name's min p_partkey — deterministic), Spark side the
     iterative min-label propagation, oracle side a recursive-CTE
     transitive closure.
  4. Golden record per multi-name cluster: the representative name is
     the min-node member's name; report n_names merged and n_parts
     covered.

Scale shape: the only fact-scale work is the distinct-name aggregate
and the final part-count join-back; blocking keeps candidates
Σ(block²); CC runs on the bounded name graph. Reference parity: the
reference has no record linkage (SURVEY.md §2.A); north-star §2.B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llmdata import dedup
from .core import QuerySpec, t
from .extras15 import blocked_name_candidates

_MATCH_DIST = 4


def _entity_resolution_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = t(spark, sf_dir, "part").select("p_partkey", "p_name")
    names = parts.groupBy("p_name").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.min("p_partkey").cast("long").alias("nid"),
    )
    cand = blocked_name_candidates(names.select("p_name", "m"))
    matched = cand.filter(
        F.levenshtein(F.col("name_a"), F.col("name_b")) <= _MATCH_DIST
    )
    ids = names.select("p_name", "nid")
    edges = (
        matched.join(
            ids.select(
                F.col("p_name").alias("name_a"), F.col("nid").alias("id_a")
            ),
            "name_a",
        )
        .join(
            ids.select(
                F.col("p_name").alias("name_b"), F.col("nid").alias("id_b")
            ),
            "name_b",
        )
        .select("id_a", "id_b")
    )
    comp = dedup.connected_components(edges)  # (node, comp)
    members = comp.join(
        names.select(F.col("nid").alias("node"), "p_name", "m"), "node"
    )
    return (
        members.groupBy(F.col("comp").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_names"),
            F.sum("m").cast("long").alias("n_parts"),
            F.min_by("p_name", "node").alias("rep_name"),
        )
        .filter(F.col("n_names") >= 2)
        .select("cluster_id", "rep_name", "n_names", "n_parts")
        .orderBy("cluster_id")
    )


_ER_SQL = """
WITH RECURSIVE names AS (
  SELECT p_name, CAST(count(*) AS BIGINT) AS m,
         CAST(min(p_partkey) AS BIGINT) AS nid
  FROM part GROUP BY p_name
), keyed AS (
  SELECT p_name, m, nid,
         split_part(p_name, ' ', 1) AS blk1,
         string_split(p_name, ' ')[-1] AS blk2
  FROM names
), cand AS (
  SELECT a.nid AS id_a, b.nid AS id_b, a.p_name AS na, b.p_name AS nb
  FROM keyed a JOIN keyed b
    ON a.blk1 = b.blk1 AND a.p_name < b.p_name
  UNION
  SELECT a.nid, b.nid, a.p_name, b.p_name
  FROM keyed a JOIN keyed b
    ON a.blk2 = b.blk2 AND a.p_name < b.p_name
), matched AS (
  SELECT id_a, id_b FROM cand WHERE levenshtein(na, nb) <= 4
), dedges AS (
  SELECT id_a AS u, id_b AS v FROM matched
  UNION
  SELECT id_b, id_a FROM matched
), reach AS (
  SELECT u, v FROM dedges
  UNION
  SELECT r.u, e.v FROM reach r JOIN dedges e ON r.v = e.u
), comp AS (
  SELECT u AS node, least(u, min(v)) AS comp FROM reach GROUP BY u
), members AS (
  SELECT c.comp, c.node, n.p_name, n.m
  FROM comp c JOIN names n ON c.node = n.nid
)
SELECT comp AS cluster_id,
       min_by(p_name, node) AS rep_name,
       CAST(count(*) AS BIGINT) AS n_names,
       CAST(sum(m) AS BIGINT) AS n_parts
FROM members
GROUP BY comp
HAVING count(*) >= 2
ORDER BY cluster_id
"""


QUERIES: dict[str, QuerySpec] = {
    "entity_resolution_pipeline": QuerySpec(
        _entity_resolution_pipeline,
        _ER_SQL,
        "composed ER: dual-key blocking -> Levenshtein match -> "
        "connected components -> golden record",
    ),
}
