"""As-of join (operators/asof.py): hand-computed matches, exact-match
semantics, tiebreak determinism, and parity with pandas.merge_asof."""

import pandas as pd

from pyspark.sql import functions as F

from httrack2warc_spark.operators.asof import asof_join


def test_asof_join_hand_computed(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 25, "b"), (2, 5, "c"), (3, 7, "d")],
        "k long, lts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 9, 1.0), (1, 10, 2.0), (1, 20, 3.0), (2, 6, 4.0)],
        "k long, rts long, val double",
    )
    out = {
        (r.k, r.lts): (r.rts, r.val)
        for r in asof_join(left, right, "k", "lts", "rts", ["val"]).collect()
    }
    assert out[(1, 10)] == (10, 2.0)   # exact match allowed
    assert out[(1, 25)] == (20, 3.0)   # latest preceding
    assert out[(2, 5)] == (None, None)  # right row is later
    assert out[(3, 7)] == (None, None)  # no right rows for the key


def test_asof_join_exact_matches_false(spark):
    left = spark.createDataFrame([(1, 10)], "k long, lts long")
    right = spark.createDataFrame(
        [(1, 10, 1.0), (1, 8, 2.0)], "k long, rts long, val double"
    )
    out = asof_join(
        left, right, "k", "lts", "rts", ["val"], exact_matches=False
    ).collect()[0]
    assert (out.rts, out.val) == (8, 2.0)  # same-ts right row excluded


def test_asof_join_tiebreak_is_deterministic(spark):
    left = spark.createDataFrame([(1, 10)], "k long, lts long")
    right = spark.createDataFrame(
        [(1, 9, 7, 1.0), (1, 9, 3, 2.0), (1, 9, 9, 3.0)],
        "k long, rts long, rid long, val double",
    ).repartition(4)
    out = asof_join(
        left, right, "k", "lts", "rts", ["rid", "val"], tiebreak="rid"
    ).collect()[0]
    assert (out.rid, out.val) == (9, 3.0)  # greatest tiebreak wins


def test_asof_join_matches_pandas_merge_asof(spark):
    # deterministic pseudo-random series over 5 keys
    lrows = [(i % 5, (i * 37) % 1000, i) for i in range(300)]
    rrows = [(i % 5, (i * 53 + 11) % 1000, float(i)) for i in range(200)]
    left = spark.createDataFrame(lrows, "k long, lts long, lid long")
    # dedupe right per (k, ts) so merge_asof (which keeps the LAST of equal
    # ts rows) and the operator's tiebreak agree on a total order
    right = (
        spark.createDataFrame(rrows, "k long, rts long, val double")
        .groupBy("k", "rts").agg(F.max("val").alias("val"))
    )
    got = (
        asof_join(left, right, "k", "lts", "rts", ["val"])
        .orderBy("lid")
        .toPandas()
    )
    lp = pd.DataFrame(lrows, columns=["k", "lts", "lid"]).sort_values("lts")
    rp = (
        pd.DataFrame(rrows, columns=["k", "rts", "val"])
        .groupby(["k", "rts"], as_index=False)["val"].max()
        .sort_values("rts")
    )
    exp = pd.merge_asof(
        lp, rp, left_on="lts", right_on="rts", by="k"
    ).sort_values("lid")
    assert list(got["val"].fillna(-1)) == list(exp["val"].fillna(-1))
    assert list(got["rts"].fillna(-1)) == list(exp["rts"].fillna(-1))
