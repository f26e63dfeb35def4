"""hash_split + pack_sequences unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ext_spark.llm.splits import hash_split, pack_sequences


def test_hash_split_deterministic_and_partition_invariant(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    a = {r["k"]: r["split"] for r in hash_split(df, "k").collect()}
    b = {r["k"]: r["split"]
         for r in hash_split(df.repartition(7), "k").collect()}
    assert a == b  # assignment is a pure function of the key
    frac = sum(1 for v in a.values() if v == "train") / len(a)
    assert 0.75 < frac < 0.85  # ~80% within sampling noise


def test_hash_split_salt_changes_assignment(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "k long")
    a = {r["k"]: r["split"] for r in hash_split(df, "k", salt="s1").collect()}
    b = {r["k"]: r["split"] for r in hash_split(df, "k", salt="s2").collect()}
    assert a != b


def test_hash_split_no_shuffle(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "k long")
    plan = hash_split(df, "k")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_sequences_contract(spark):
    rows = [(i, " ".join(["w"] * n))
            for i, n in enumerate([100, 900, 600, 500, 2000, 10, 10])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["n_tokens"], r["seq_id"])
           for r in pack_sequences(df, "doc_id", "text",
                                   budget=1000, num_partitions=3).collect()}
    # exclusive cumsum: 0,100,1000,1600,2100,4100,4110 → DIV 1000
    assert out == {0: (100, 0), 1: (900, 0), 2: (600, 1), 3: (500, 1),
                   4: (2000, 2), 5: (10, 4), 6: (10, 4)}
    # every sequence starts where the previous ended: seq ids are a
    # non-decreasing function of doc order
    seqs = [out[i][1] for i in sorted(out)]
    assert seqs == sorted(seqs)
