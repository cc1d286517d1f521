"""q_scan_binaryfile's non-SQL residue after the round-10 promotion.

The key's hash gate now proves the decode end-to-end (DuckDB derives
name/dims/pixel_mean independently from the pixel-generation law); the
one column that left the gated output — the encoded byte LENGTH, which
only the codec run can produce — keeps its witness here: Spark's
binaryFile `length` must equal the on-disk size of every synthesized
file, and every payload must be non-trivially larger than its format
header floor (a zero-pixel or truncated encode would fail both).
"""

from __future__ import annotations

import os

from self_healing_data_pipeline_spark import registry
from self_healing_data_pipeline_spark.session import scratch_path

registry.load_all()

# Smallest legal payloads: PNG = 8B magic + IHDR(25) + IDAT/IEND
# overhead; BMP = 54B header. Anything at or under these is a stub.
_HEADER_FLOOR = {"png": 57, "bmp": 54}


def test_binaryfile_length_matches_disk_and_clears_header_floor(
    spark, sf_dir
):
    # Run the query first: it synthesizes the scratch directory
    # (scratch_path is the non-wiping twin of scratch_dir — calling
    # scratch_dir here would WIPE the directory the query just built).
    out = registry.QUERIES["q_scan_binaryfile"](spark, sf_dir)
    assert out.count() == 24
    d = scratch_path("binfiles", sf_dir)
    assert os.path.isdir(d), d

    rows = (
        spark.read.format("binaryFile")
        .load(d)
        .select("path", "length")
        .collect()
    )
    assert len(rows) == 24
    for r in rows:
        p = r["path"]
        local = p[len("file:"):] if p.startswith("file:") else p
        ext = local.rsplit(".", 1)[1]
        assert r["length"] == os.path.getsize(local)
        assert r["length"] > _HEADER_FLOOR[ext], (local, r["length"])
