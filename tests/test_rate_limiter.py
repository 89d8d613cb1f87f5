"""applyInPandasWithState per-host rate limiter: budget respected within a
batch, state (admitted_total) carries across micro-batches, no row loss."""

import json

from httrack2warc_spark.streaming.rate_limiter import rate_limit_stream

SCHEMA = "host string, url string, req_seq long"


def test_rate_limit_two_batches(spark, tmp_path):
    src = tmp_path / "reqs"
    src.mkdir()
    batch1 = [
        {"host": "a.com", "url": f"http://a.com/{i}", "req_seq": i} for i in range(5)
    ] + [{"host": "b.com", "url": "http://b.com/0", "req_seq": 100}]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in batch1))

    outdir = tmp_path / "decisions"

    def run_trigger():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = (
            rate_limit_stream(stream, budget_per_batch=3)
            .writeStream.format("json")
            .outputMode("append")
            .option("path", str(outdir))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_trigger()
    decided = spark.read.json(str(outdir))
    rows = {(r.host, r.req_seq): r for r in decided.collect()}
    assert len(rows) == 6  # no row loss
    a_admitted = [rows[("a.com", i)].admitted for i in range(5)]
    assert a_admitted == [True, True, True, False, False]  # budget 3, seq order
    assert rows[("b.com", 100)].admitted is True

    # second batch: state carries — admitted_total accumulates
    batch2 = [
        {"host": "a.com", "url": f"http://a.com/x{i}", "req_seq": 10 + i}
        for i in range(2)
    ]
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in batch2))
    run_trigger()
    rows2 = {
        (r.host, r.req_seq): r
        for r in spark.read.json(str(outdir)).collect()
    }
    a2 = rows2[("a.com", 11)]
    assert a2.admitted is True
    assert a2.admitted_total == 5  # 3 from batch 1 + 2 now
    assert a2.batch_no == 2
