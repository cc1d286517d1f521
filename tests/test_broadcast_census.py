"""Unit coverage for the broadcast-growth census tool (round 12).

The full two-SF sweep is an offline audit (tools/broadcast_census.py,
~6 min for 384 keys x 2 SFs), not a per-commit gate; what CI pins is
(a) the pure flagging logic, (b) the executed-plan walker actually
finding a BroadcastExchange and its numOutputRows on a live plan, and
(c) the committed census artifacts staying in sync with the
documented finding counts (so SCALE.md's table cannot silently rot).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import broadcast_census as bc  # noqa: E402


def test_growing_flags_positional_decade_growth():
    census = {
        "q_fixed": {"lo": [25, 5], "hi": [25, 5]},          # dims: flat
        "q_aqe": {"lo": [6000], "hi": [60000]},             # 10x, big
        "q_small": {"lo": [4], "hi": [40]},                 # under MIN_ROWS
        "q_two": {"lo": [1000, 10], "hi": [1100, 100]},     # 2nd grows
        "q_err": {"error": "boom"},
        "q_none": {"lo": [], "hi": []},
    }
    flagged = bc.growing(census)
    by_key = {f["key"]: f for f in flagged}
    assert set(by_key) == {"q_aqe", "q_two"}
    assert by_key["q_aqe"]["ratio"] == 10.0
    assert by_key["q_two"]["rows_hi"] == 100


def test_walker_finds_live_broadcast_rows(spark):
    from pyspark.sql import functions as F

    big = spark.range(0, 1000).withColumnRenamed("id", "k")
    small = spark.range(0, 25).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    df = big.join(F.broadcast(small), "k")
    df.collect()
    rows = bc.broadcast_rows(df)
    assert rows == [25], rows


def test_committed_artifacts_match_documented_findings():
    full = json.load(
        open(os.path.join(REPO, "tools", "broadcast_census.json"))
    )
    forced = json.load(
        open(os.path.join(REPO, "tools", "broadcast_census_forced.json"))
    )
    assert len(full["census"]) == 384
    assert not any("error" in r for r in full["census"].values())
    assert len(forced["census"]) == 384
    assert not any("error" in r for r in forced["census"].values())
    # Post-fix state (the 28 forced corpus-growing hints found by the
    # round-12 census were removed this round): with size-based
    # selection disabled, NO forced broadcast of a growing relation
    # remains; the only growing forced builds are the audited bounded
    # grains (BOUNDED_BUILD), reported separately with their bounds.
    assert forced["flagged"] == []
    bounded_keys = {f["key"] for f in forced["audited_bounded"]}
    assert bounded_keys <= set(bc.BOUNDED_BUILD)
    # Default-mode growth stays allowed: AQE choosing broadcast at the
    # fixture SF is the design (it sizes those out at real scale). The
    # census just has to exist for every key; its flagged set only
    # contains AQE choices or audited-bounded builds now.
    assert not ({f["key"] for f in full["flagged"]}
                & {f["key"] for f in forced["flagged"]})
