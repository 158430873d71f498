"""Planted-truth quality floors for the round-4 statistical/linkage
families (round-4 verdict ask #7) — the same discipline passage/semantic
dedup got in round 4: `quality.py` EMITS the measured values per round;
these tests ASSERT the floors so a regression fails the suite, not just
drifts a JSON number.

* fuzzy_part_match blocking: a planted later-token edit shares the
  first-token block and must ALWAYS be recalled; a first-token edit
  breaks the block and must be missed (if blocking suddenly recalled it,
  the candidate set is no longer block-bounded — a scale regression).
* cusum_changepoint: on a planted level shift with bounded noise, the
  CUSUM argmax must land within 2 days of the last pre-shift day.
* knn_label_vote: planting each query as an exact copy of a corpus
  vector together with two extra copies guarantees ≥3 of its 5
  neighbors carry the true label — the majority vote must recover it
  for every query.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from agent_data_pipeline_spark.queries import REGISTRY

SF = "/root/testdata/sf0.01"


def test_fuzzy_blocking_planted_recall(spark):
    part = spark.read.parquet(f"{SF}/part.parquet")
    base = [
        r["p_name"]
        for r in part.select("p_name").distinct().orderBy("p_name").limit(20).collect()
    ]
    planted = []  # (orig, mutated, block_preserving)
    for i, nm in enumerate(base):
        toks = nm.split(" ")
        if i % 2 == 0 and len(toks) > 1:
            toks[-1] += "x"
            planted.append((nm, " ".join(toks), True))
        else:
            toks[0] += "x"
            planted.append((nm, " ".join(toks), False))
    aug = part.select("p_name").unionByName(
        spark.createDataFrame([(m,) for _, m, _ in planted], "p_name string")
    )
    blk = aug.select("p_name", F.split("p_name", " ")[0].alias("blk")).distinct()
    a, b = blk.alias("a"), blk.alias("b")
    got = {
        (r["x"], r["y"])
        for r in a.join(b, F.col("a.blk") == F.col("b.blk"))
        .filter(F.col("a.p_name") < F.col("b.p_name"))
        .filter(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 10)
        .select(F.col("a.p_name").alias("x"), F.col("b.p_name").alias("y"))
        .collect()
    }

    def key(o, m):
        return (o, m) if o < m else (m, o)

    for o, m, preserving in planted:
        if preserving:
            assert key(o, m) in got, (o, m)
        else:
            assert key(o, m) not in got, (o, m)


def test_cusum_planted_shift_detection_delay(spark):
    shifts = {"A": (80, 40), "B": (30, 25), "C": (60, -30)}
    rows = []
    for st, (s_day, delta) in shifts.items():
        for i in range(120):
            noise = ((i * 1103515245 + ord(st) * 12345) % 21) - 10
            rows.append((st, i, 200 + (delta if i >= s_day else 0) + noise))
    syn = spark.createDataFrame(rows, "event_type string, day long, n long")
    stats = syn.groupBy("event_type").agg(
        F.sum("n").alias("tot"), F.count(F.lit(1)).alias("n_days")
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.col("abs_cusum").desc(), F.col("day")
    )
    detected = {
        r["event_type"]: r["day"]
        for r in syn.join(F.broadcast(stats), "event_type")
        .withColumn("dev", F.col("n") - F.col("tot") / F.col("n_days"))
        .withColumn("abs_cusum", F.abs(F.sum("dev").over(wc)))
        .withColumn("_rk", F.row_number().over(wr))
        .filter(F.col("_rk") == 1)
        .collect()
    }
    for st, (s_day, _) in shifts.items():
        assert abs(detected[st] - (s_day - 1)) <= 2, (st, detected[st], s_day)


def test_knn_planted_vote_recovers_label(spark, tmp_path):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    src = emb.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < 40))
    aug = (
        emb.filter(F.col("vec_id") >= 20)
        .unionByName(src.withColumn("vec_id", F.col("vec_id") - 20))
        .unionByName(src.withColumn("vec_id", F.col("vec_id") + 100_000))
        .unionByName(src.withColumn("vec_id", F.col("vec_id") + 200_000))
    )
    aug.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    conf = REGISTRY["knn_label_vote"].spark(spark, str(tmp_path)).collect()
    total = sum(r["n"] for r in conf)
    correct = sum(r["n"] for r in conf if r["true_label"] == r["pred_label"])
    assert total == 20, conf
    assert correct == total, conf
