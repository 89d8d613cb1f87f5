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


def test_asof_join_forward_matches_pandas(spark):
    """direction="forward" == pandas merge_asof(direction="forward") on a
    300x200 pseudo-random fixture (right deduped per (k, ts) as in the
    backward parity test)."""
    import pandas as pd
    from pyspark.sql import functions as F

    lpdf = pd.DataFrame({
        "k": [f"k{i % 7}" for i in range(300)],
        "lts": [(i * 37) % 1000 for i in range(300)],
    })
    rpdf = pd.DataFrame({
        "k": [f"k{i % 7}" for i in range(200)],
        "rts": [(i * 53) % 1000 for i in range(200)],
        "val": list(range(200)),
    })
    rpdf = rpdf.sort_values(["k", "rts", "val"]).drop_duplicates(
        ["k", "rts"], keep="last"
    )
    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)
    got = (
        asof_join(left, right, "k", "lts", "rts", ["val"],
                  direction="forward")
        .orderBy("k", "lts").toPandas()
    )
    exp = pd.merge_asof(
        lpdf.sort_values("lts"), rpdf.sort_values("rts"),
        left_on="lts", right_on="rts", by="k", direction="forward",
    ).sort_values(["k", "lts"]).reset_index(drop=True)
    for c in ("rts", "val"):
        assert got[c].fillna(-1).tolist() == exp[c].fillna(-1).tolist(), c


def test_asof_join_forward_exact_matches(spark):
    from pyspark.sql import functions as F

    left = spark.createDataFrame([("a", 10)], ["k", "lts"])
    right = spark.createDataFrame(
        [("a", 10, "at"), ("a", 20, "after")], ["k", "rts", "val"]
    )
    inc = asof_join(left, right, "k", "lts", "rts", ["val"],
                    direction="forward").collect()[0]
    assert inc["val"] == "at"
    exc = asof_join(left, right, "k", "lts", "rts", ["val"],
                    direction="forward", exact_matches=False).collect()[0]
    assert exc["val"] == "after"


def test_asof_join_rejects_bad_direction(spark):
    import pytest as _pytest

    left = spark.createDataFrame([("a", 1)], ["k", "lts"])
    right = spark.createDataFrame([("a", 1, 1)], ["k", "rts", "val"])
    with _pytest.raises(ValueError):
        asof_join(left, right, "k", "lts", "rts", ["val"],
                  direction="nearest")


def test_asof_join_null_timestamps_never_match(spark):
    """DuckDB ASOF / pandas merge_asof semantics: a NULL-ts right row is
    invisible (it must not attach to left rows before the first real right
    row), and a NULL-ts left row gets the all-NULL no-match result — in
    both traversal directions."""
    left = spark.createDataFrame(
        [("a", 5), ("a", None)], "k string, lts int"
    )
    right = spark.createDataFrame(
        [("a", None, "ghost"), ("a", 10, "real")],
        "k string, rts int, val string",
    )
    back = {r["lts"]: r["val"] for r in asof_join(
        left, right, "k", "lts", "rts", ["val"]).collect()}
    # lts=5 precedes the only real right row (ts=10): no match — the
    # null-ts "ghost" must NOT have been picked up by the nulls-first sort
    assert back == {5: None, None: None}
    fwd = {r["lts"]: r["val"] for r in asof_join(
        left, right, "k", "lts", "rts", ["val"],
        direction="forward").collect()}
    # forward: lts=5 matches ts=10; NULL left ts still matches nothing
    assert fwd == {5: "real", None: None}
