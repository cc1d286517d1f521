"""Custom Python DataSource connector (sources/api_source.py): page
pruning logic, parallel batch read, filter-pushdown correctness, and
exactly-once offset-tracked streaming incl. checkpoint resume."""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    LessThanOrEqual,
)

from self_healing_data_pipeline_spark.sources.api_source import (
    prune_page_range,
    register_api_source,
)


def test_prune_page_range_pure():
    assert prune_page_range([], 20) == (0, 19)
    assert prune_page_range([EqualTo(("page",), 7)], 20) == (7, 7)
    assert prune_page_range(
        [GreaterThan(("page",), 3), LessThanOrEqual(("page",), 10)], 20
    ) == (4, 10)
    # filters on other columns leave the range untouched
    assert prune_page_range([EqualTo(("id",), 5)], 20) == (0, 19)
    # contradictory bounds collapse to an empty range (lo > hi)
    lo, hi = prune_page_range(
        [EqualTo(("page",), 2), EqualTo(("page",), 9)], 20
    )
    assert lo > hi


def test_batch_read_parallel_pages_and_pushdown(spark):
    register_api_source(spark)
    df = (
        spark.read.format("synth_api")
        .option("pages", "8")
        .option("page_size", "10")
        .load()
    )
    assert df.count() == 80
    assert df.rdd.getNumPartitions() == 8  # one fetch task per page
    one = df.filter("page = 5").collect()
    assert len(one) == 10
    assert {r["page"] for r in one} == {5}
    assert sorted(r["id"] for r in one) == list(range(50, 60))
    # pushdown-pruned read returns the same rows Spark's re-applied
    # filter would keep — pruning is fetch-only, never semantic
    rng = df.filter("page > 5 AND page <= 7").collect()
    assert sorted({r["page"] for r in rng}) == [6, 7]


def test_stream_reads_exactly_once_and_resumes(spark, tmp_path):
    register_api_source(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain(max_pages: int):
        q = (
            spark.readStream.format("synth_api")
            .option("page_size", "10")
            .option("max_pages", str(max_pages))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    drain(3)
    got = spark.read.parquet(out)
    assert got.count() == 30
    assert sorted(r["page"] for r in got.select("page").distinct().collect()) == [0, 1, 2]
    # resume from the SAME checkpoint with more pages available: only
    # the unread pages arrive — no duplicates of pages 0-2
    drain(5)
    got2 = spark.read.parquet(out)
    assert got2.count() == 50
    assert got2.groupBy("page").count().filter("count != 10").count() == 0
    ids = sorted(r["id"] for r in got2.select("id").collect())
    assert ids == list(range(50))


def test_write_two_phase_commit_publishes_manifest(spark, tmp_path):
    register_api_source(spark)
    import json

    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    df = spark.range(100).selectExpr(
        "id", "cast(id % 4 as int) as page", "'view' as event_type",
        "id * 2 as amount_cents", "cast(id as string) as token"
    ).repartition(4)
    df.write.format("synth_api").option("path", spool).mode("append").save()
    man = json.load(open(os.path.join(spool, "_MANIFEST.json")))
    assert man["rows"] == 100
    assert len(man["files"]) == 4  # one staged request per task
    # manifest lists exactly the published files; staging is empty
    published = sorted(
        f for f in os.listdir(spool) if f.startswith("req_")
    )
    assert published == man["files"]
    assert os.listdir(os.path.join(spool, ".staging")) == []
    # rows round-trip through the spool
    back = [
        json.loads(line)
        for f in man["files"]
        for line in open(os.path.join(spool, f))
    ]
    assert sorted(r["id"] for r in back) == list(range(100))


def test_write_abort_publishes_nothing(spark, tmp_path):
    register_api_source(spark)
    import pytest as _pytest

    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    bad = spark.range(10).selectExpr(
        "id", "cast(id as int) as page", "'view' as event_type",
        "cast(assert_true(id < 5, 'poison') as bigint) as amount_cents",
        "'t' as token",
    ).repartition(2)
    with _pytest.raises(Exception):
        bad.write.format("synth_api").option("path", spool).mode(
            "append"
        ).save()
    # no manifest, nothing published — the half-written batch is invisible
    assert not os.path.exists(os.path.join(spool, "_MANIFEST.json"))
    assert [f for f in os.listdir(spool) if f.startswith("req_")] == []


def test_stream_write_per_epoch_manifests(spark, tmp_path):
    register_api_source(spark)
    import json

    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("synth_api")
        .option("page_size", "10")
        .option("max_pages", "3")
        .load()
        .writeStream.format("synth_api")
        .option("path", spool)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    manifests = sorted(
        f for f in os.listdir(spool) if f.startswith("_MANIFEST_")
    )
    assert manifests, "at least one epoch manifest published"
    total = sum(
        json.load(open(os.path.join(spool, m)))["rows"] for m in manifests
    )
    assert total == 30
