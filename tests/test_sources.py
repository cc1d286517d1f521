"""Ingestion semantics tests: the reference's parse rules re-expressed
(CSV header+dynamic typing, JSON array/single-object, unsupported-format
rejection, empty-input guard) — FIXTURES.md §2 scenarios."""

from __future__ import annotations

import os

import pytest

from self_healing_data_pipeline_spark.sources.readers import (
    UnsupportedFormatError,
    read_any,
    read_csv,
    read_json,
    read_table,
)

MESSY_CSV = """cust_id,full_name,email,signup_date,balance,is_active,notes
1,Alice Smith,alice@example.com,2024-01-15,1203.50,true,
2,Bob Jones,,2024-02-01,-50.25,false,vip
3,Carol Díaz,carol@example,2024-02-30,abc,true,"has, comma"
,Dave Null,dave@example.com,,0,maybe,
"""


@pytest.fixture(scope="module")
def messy_csv(tmp_path_factory):
    p = tmp_path_factory.mktemp("fixtures") / "messy_customers.csv"
    p.write_text(MESSY_CSV)
    return str(p)


def test_csv_header_and_dynamic_typing(spark, messy_csv):
    df = read_csv(spark, messy_csv)
    assert df.columns == [
        "cust_id",
        "full_name",
        "email",
        "signup_date",
        "balance",
        "is_active",
        "notes",
    ]
    assert df.count() == 4
    kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert kinds["cust_id"] in ("int", "bigint")  # numeric promoted
    assert kinds["balance"] == "string"  # mixed numeric/text → string fallback
    assert kinds["is_active"] == "string"  # mixed boolean/text → string


def test_csv_embedded_comma_quoted(spark, messy_csv):
    row = read_csv(spark, messy_csv).filter("cust_id = 3").collect()[0]
    assert row["notes"] == "has, comma"


def test_json_array_of_objects(spark, tmp_path):
    p = tmp_path / "orders.json"
    p.write_text(
        '[{"order_id": 100, "total": 19.98}, {"order_id": 101, "total": 0}]'
    )
    df = read_json(spark, str(p))
    assert df.count() == 2
    assert set(df.columns) == {"order_id", "total"}


def test_json_single_object_wraps_to_one_row(spark, tmp_path):
    p = tmp_path / "one.json"
    p.write_text('{"order_id": 100, "total": 19.98}')
    df = read_json(spark, str(p))
    assert df.count() == 1


def test_json_nested_schema(spark, tmp_path):
    p = tmp_path / "nested.json"
    p.write_text(
        '[{"order_id": 100, "customer": {"id": 1, "name": "Alice"},'
        ' "items": [{"sku": "A1", "qty": 2, "price": 9.99}]}]'
    )
    df = read_json(spark, str(p))
    kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert kinds["customer"].startswith("struct<")
    assert kinds["items"].startswith("array<struct<")


def test_unsupported_format_rejected(spark, tmp_path):
    p = tmp_path / "data.xlsx"
    p.write_text("not really excel")
    with pytest.raises(UnsupportedFormatError):
        read_any(spark, str(p))


def test_empty_csv_header_only(spark, tmp_path):
    p = tmp_path / "empty.csv"
    p.write_text("a,b,c\n")
    df = read_csv(spark, str(p))
    assert df.columns == ["a", "b", "c"]
    assert df.count() == 0


def test_events_nanos_timestamp_readable(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    # naive parquet nanos → NTZ (session-timezone-independent rendering)
    assert dict((f.name, f.dataType.simpleString()) for f in ev.schema.fields)[
        "ts"
    ] == "timestamp_ntz"
    first = ev.orderBy("event_id").first()
    assert first["ts"].year == 2024


def test_csv_quarantine_splits_good_and_malformed(spark, tmp_path):
    from pyspark.sql import types as T

    from self_healing_data_pipeline_spark.sources.readers import (
        read_csv_with_quarantine,
    )

    p = tmp_path / "mixed.csv"
    p.write_text(
        "id,amount,label\n"
        "1,10.5,ok\n"
        "2,not_a_number,bad\n"  # malformed: amount not numeric
        "3,30.25,ok\n"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("amount", T.DoubleType()),
            T.StructField("label", T.StringType()),
        ]
    )
    good, bad = read_csv_with_quarantine(spark, str(p), schema)
    good_rows = {r["id"]: r["amount"] for r in good.collect()}
    assert good_rows == {1: 10.5, 3: 30.25}
    bad_rows = [r["raw_record"] for r in bad.collect()]
    assert bad_rows == ["2,not_a_number,bad"]


def test_partition_pruned_scan_reads_only_matching_year(spark, sf_dir):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["q_scan_partition_pruned"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_year" in plan
    got = df.count()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    from pyspark.sql import functions as F

    assert got == orders.filter(F.year("o_orderdate") == 1997).count()


def test_read_media_dir_binary_files(spark, tmp_path):
    from self_healing_data_pipeline_spark.operators.multimodal import (
        extract_features,
        png_bytes,
    )
    from self_healing_data_pipeline_spark.sources.readers import read_media_dir

    (tmp_path / "a.png").write_bytes(png_bytes(32, 16) + b"body")
    (tmp_path / "b.png").write_bytes(png_bytes(800, 600))
    (tmp_path / "notes.txt").write_text("not media")
    media = read_media_dir(spark, str(tmp_path), glob="*.png")
    rows = media.collect()
    assert len(rows) == 2  # txt filtered engine-side by pathGlobFilter
    assert all(r["n_bytes"] == len(r["payload"]) for r in rows)
    assert len({r["media_id"] for r in rows}) == 2  # stable ids from path
    # and the payloads flow straight into the multimodal extractor
    feats = {
        r["media_id"]: r
        for r in extract_features(
            media.select("media_id", "payload")
        ).collect()
    }
    dims = sorted((f["width"], f["height"]) for f in feats.values())
    assert dims == [(32, 16), (800, 600)]
