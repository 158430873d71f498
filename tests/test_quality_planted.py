"""Planted-truth quality floors for the round-4 statistical/linkage
families (round-4 verdict ask #7) — the same discipline passage/semantic
dedup got in round 4: `quality.py` EMITS the measured values per round;
these tests ASSERT the floors so a regression fails the suite, not just
drifts a JSON number.

* fuzzy_part_match blocking (dual-key since round 6: first token ∪
  last token — see extras15.blocked_name_candidates): a later-token
  edit shares the first-token block, a first-token edit shares the
  last-token block — BOTH plant classes must now be recalled (round 5
  measured first-token-only blocking at 0.0 breaking recall; the
  second key is the standard record-linkage fix and stays
  block-bounded). An edit to BOTH end tokens still correctly escapes —
  asserted so the candidate set provably remains blocked, not
  quadratic.
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
    from agent_data_pipeline_spark.queries.extras15 import (
        blocked_name_candidates,
    )

    part = spark.read.parquet(f"{SF}/part.parquet")
    base = [
        r["p_name"]
        for r in part.select("p_name").distinct().orderBy("p_name").limit(21).collect()
    ]
    # Three plant classes: later-token edit (first-token key holds),
    # first-token edit (last-token key holds), both-end-token edit
    # (neither key holds — must escape, proving blocking is real).
    planted = []  # (orig, mutated, kind)
    for i, nm in enumerate(base):
        toks = nm.split(" ")
        if i % 3 == 0 and len(toks) > 1:
            toks[-1] += "x"
            planted.append((nm, " ".join(toks), "keep_first"))
        elif i % 3 == 1 and len(toks) > 1:
            toks[0] += "x"
            planted.append((nm, " ".join(toks), "keep_last"))
        elif len(toks) > 1:
            toks[0] += "x"
            toks[-1] += "x"
            planted.append((nm, " ".join(toks), "escape"))
    aug = part.select("p_name").unionByName(
        spark.createDataFrame([(m,) for _, m, _ in planted], "p_name string")
    )
    names_m = aug.groupBy("p_name").agg(F.count(F.lit(1)).alias("m"))
    got = {
        (r["name_a"], r["name_b"])
        for r in blocked_name_candidates(names_m)
        .filter(F.levenshtein(F.col("name_a"), F.col("name_b")) <= 10)
        .select("name_a", "name_b")
        .collect()
    }

    def key(o, m):
        return (o, m) if o < m else (m, o)

    for o, m, kind in planted:
        if kind == "escape":
            assert key(o, m) not in got, (o, m)
        else:
            assert key(o, m) in got, (o, m, kind)


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
