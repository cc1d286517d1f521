"""Self-healing continuous ingestion tour: drift, changes, quarantine.

Run: python examples/self_healing_stream.py

The reference's premise (upload → validate → load, recovering from
failures) as a continuous pipeline, each leg handled by a tested
operator:

1. drift    — a new feed batch arrives with a widened/changed schema;
              `operators.schema_evolution.evolve_union` heals the union
              and reports every drift event (q_schema_evolution's core).
2. changes  — a CDC feed of upserts/deletes merges into a keyed state
              snapshot with tombstones (streaming/cdc.py): latest-seq
              wins regardless of arrival order, replays are idempotent.
3. quarantine — malformed rows route to a quarantine table instead of
              failing the load (streaming/ingest.py, q_ingest_quarantine).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from self_healing_data_pipeline_spark import get_spark  # noqa: E402
from self_healing_data_pipeline_spark.operators.schema_evolution import (  # noqa: E402
    evolve_union,
)
from self_healing_data_pipeline_spark.streaming.cdc import (  # noqa: E402
    apply_changes,
    live_state,
)


def main() -> None:
    spark = get_spark("self-healing-stream-example")

    print("== 1. schema drift heals instead of crashing ==")
    v1 = spark.createDataFrame(
        [(1, 10, "click"), (2, 11, "view")], "event_id long, user_id int, kind string"
    )
    # next batch: user_id widened to bigint, `kind` gone, `value` added
    v2 = spark.createDataFrame(
        [(3, 2**40, 9.5)], "event_id long, user_id long, value double"
    )
    unioned, events = evolve_union(v1, v2)
    for e in events:
        print(f"   drift: {e.column:<10} {e.kind:<12} "
              f"{e.old_type} -> {e.new_type} (resolved {e.resolved_type})")
    unioned.show()

    print("== 2. CDC apply-changes with tombstones ==")
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "changes")
        os.makedirs(src)
        with open(os.path.join(src, "b1.csv"), "w") as f:
            f.write("op,id,seq,name\nupsert,1,10,alice\nupsert,2,11,bob\n")
        with open(os.path.join(src, "b2.csv"), "w") as f:
            f.write("op,id,seq,name\nupsert,1,20,alice2\ndelete,2,21,\n")
        os.utime(os.path.join(src, "b1.csv"), (0, 0))  # deterministic order
        schema = T.StructType(
            [
                T.StructField("op", T.StringType()),
                T.StructField("id", T.LongType()),
                T.StructField("seq", T.LongType()),
                T.StructField("name", T.StringType()),
            ]
        )
        apply_changes(
            spark,
            src,
            os.path.join(tmp, "state"),
            os.path.join(tmp, "ckpt"),
            schema,
            key="id",
            seq="seq",
            max_files_per_trigger=1,
        )
        print("   live state after upsert+delete feed:")
        live_state(spark, os.path.join(tmp, "state")).orderBy("id").show()

    print("== 3. malformed rows quarantine, the load proceeds ==")
    from self_healing_data_pipeline_spark.registry import QUERIES, load_all

    load_all()
    QUERIES["q_ingest_quarantine"](spark, "/root/testdata/sf0.001").show()

    print("== 4. declarative expectations: audit + first-failing-rule routing ==")
    from pyspark.sql import functions as F

    from self_healing_data_pipeline_spark.operators.expectations import (
        expect_between,
        expect_in,
        expect_positive,
        route_violations,
        run_expectations,
    )
    from self_healing_data_pipeline_spark.sources.readers import read_table

    li = read_table(spark, "/root/testdata/sf0.001", "lineitem")
    rules = [
        expect_positive("quantity_positive", "l_quantity"),
        expect_between("discount_in_unit_range", "l_discount", 0, 1),
        expect_in("returnflag_enum", "l_returnflag", ["A", "N", "R"]),
    ]
    print("   one-scan rule report:")
    run_expectations(li, rules).show()
    print("   quarantine routing (clean rows stay, violations tagged):")
    route_violations(li, rules).groupBy(
        F.coalesce("quarantine_rule", F.lit("clean")).alias("route")
    ).count().show()

    spark.stop()


if __name__ == "__main__":
    main()
