"""Where does simhash_neardup spend 21s at sf0.1? Phase timings.
count() prunes projections, so every phase is forced with an aggregate."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from httrack2warc_spark import get_spark
from pyspark.sql import functions as F

spark = get_spark(app_name="simhash-prof", master="local[8]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

from httrack2warc_spark.operators.dedup import (
    _shingles, simhash64, simhash_dedup, minhash_signatures,
    minhash_lsh_candidates,
)

docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").persist()
print("docs:", docs.count())

def t(label, df, col):
    t0 = time.time()
    v = df.agg(F.sum(F.hash(col))).collect()[0][0]
    print(f"{label}: agg={v} in {time.time()-t0:.2f}s")

t("shingle sizes", docs.select(F.size(_shingles(F.col("text"), 2)).alias("n")), "n")
t("shingle+hash", docs.select(
    F.aggregate(F.transform(_shingles(F.col("text"), 2), lambda s: F.xxhash64(s)),
                F.lit(0).cast("long"), lambda a, x: F.try_add(a, x)).alias("n")), "n")
t("simhash64 fp", docs.select(simhash64(F.col("text"), 2).alias("fp")), "fp")

# materialized words variant
words = F.filter(F.split(F.trim(F.regexp_replace(F.lower(F.col("text")), r"[^\w\s]+", " ")), r"\s+"),
                 lambda w: F.length(w) > 0)
dw = docs.withColumn("__w", words)
count = F.greatest(F.size(F.col("__w")) - F.lit(1), F.lit(0))
sh2 = F.when(count <= 0, F.array()).otherwise(
    F.transform(F.sequence(F.lit(0), count - F.lit(1)),
                lambda i: F.concat_ws(" ", F.slice(F.col("__w"), i + 1, 2))))
t("materialized-words shingle+hash", dw.select(
    F.aggregate(F.transform(sh2, lambda s: F.xxhash64(s)),
                F.lit(0).cast("long"), lambda a, x: F.try_add(a, x)).alias("n")), "n")

t0 = time.time()
n = simhash_dedup(docs, "text", "doc_id", 2, 3, 4).count()
print(f"full simhash_dedup: {n} rows in {time.time()-t0:.2f}s")

t0 = time.time()
sigs = minhash_signatures(docs, "text", "doc_id", 32, 3)
v = sigs.agg(F.sum(F.hash(F.element_at("minhash", 1)))).collect()[0][0]
print(f"minhash signatures: in {time.time()-t0:.2f}s")
t0 = time.time()
n = minhash_lsh_candidates(sigs, "doc_id", "minhash", 8, 4, 1000).count()
print(f"minhash candidates (capped): {n} in {time.time()-t0:.2f}s")
t0 = time.time()
n = minhash_lsh_candidates(sigs, "doc_id", "minhash", 8, 4, None).count()
print(f"minhash candidates (uncapped): {n} in {time.time()-t0:.2f}s")
