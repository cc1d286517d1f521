"""Round-6 batch 4 (SURVEY.md §2.1): custom-connector queries — the
Python DataSource API source end to end (batch read with pushdown,
oracle-checked payloads) and the binary-file multimodal ingest scan.

Reference parity: the API-ingestion vision
(`automated-data-catalog-&-etl/README.md:2`); the connector itself is
`sources/api_source.py`."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.api_source import (
    register_api_source,
)


@query(
    "q_scan_api_source",
    oracle="""
    SELECT i AS id,
           CAST(i // 50 AS INT) AS page,
           CASE CAST(i % 3 AS INT) WHEN 0 THEN 'view' WHEN 1 THEN 'click'
                ELSE 'purchase' END AS event_type,
           CAST((i * 37) % 10000 AS BIGINT) AS amount_cents,
           MD5(CAST(i AS VARCHAR)) AS token
    FROM generate_series(0, 999) t(i)
    ORDER BY id
    """,
)
def q_scan_api_source(spark, sf_dir):
    """Custom CONNECTOR read (PySpark 4 Python DataSource API): 20
    pages × 50 records from the registered ``synth_api`` source — one
    InputPartition per page (executors fetch pages in parallel, the
    real-API parallelism unit), page-range filter pushdown available
    (`sources/api_source.py::prune_page_range`), and the ENTIRE
    payload oracle-checked cell by cell against DuckDB
    ``generate_series`` — connector correctness, not just plumbing.
    The fixture volume is a connector option, not sf-dependent (the
    'external service' doesn't scale with the warehouse)."""
    register_api_source(spark)
    return (
        spark.read.format("synth_api")
        .option("pages", "20")
        .option("page_size", "50")
        .load()
        .orderBy("id")
    )


@query(
    "q_scan_binaryfile",
    oracle="""
    WITH f AS (
      SELECT i,
             CAST(16 + (i % 3) * 4 AS INT) AS h,
             CAST(20 + (i % 5) * 4 AS INT) AS w,
             CASE WHEN i % 2 = 0 THEN 'png' ELSE 'bmp' END AS ext
      FROM generate_series(0, 23) t(i)
    ), px AS (
      SELECT f.i,
             AVG(CAST((yy * 7 + xx * 13 + f.i) % 256 AS DOUBLE))
               AS pixel_mean
      FROM f, generate_series(0, 23) ty(yy), generate_series(0, 35) tx(xx)
      WHERE yy < f.h AND xx < f.w
      GROUP BY f.i
    )
    SELECT printf('img_%03d_%dx%d.%s', f.i, f.w, f.h, f.ext) AS name,
           f.w AS width, f.h AS height, px.pixel_mean,
           TRUE AS dims_ok
    FROM f JOIN px ON f.i = px.i
    ORDER BY name
    """,
)
def q_scan_binaryfile(spark, sf_dir):
    """MULTIMODAL INGEST scan: Spark's ``binaryFile`` source reading a
    directory of real image files into (path, length, content) rows,
    then header-parsing + REAL pixel-decoding each payload through the
    repo's codecs — the front door a 100 TB image corpus actually
    arrives through (object-store listings of media files, not
    parquet).

    The fixture synthesizes a small scratch directory of PNG + BMP
    files (deterministic doc-seeded pixels, encoder twins from
    `operators/codecs.py`) because the testdata carries no media; the
    SCAN path — binaryFile source, Arrow-batched mapInPandas decode,
    per-file witness columns — is the real one.

    PROMOTED to oracle-backed (round-10): the fixture pixels follow a
    closed-form law (``(yy*7 + xx*13 + i) % 256``), so DuckDB derives
    every output column INDEPENDENTLY of the byte path — names and
    dims from the synthesis parameters, ``pixel_mean`` by averaging
    the law over the pixel grid (integer-exact float64 both sides).
    The Spark side still travels the full production route (encode →
    real files on disk → binaryFile scan → zlib/LZW inflate → pixel
    decode), so a hash match certifies the decode end-to-end; a wrong
    pixel anywhere shifts the mean. The encoded byte length (the one
    column not derivable without running the codec) moved to the
    rows-only era's witness tests.

    Scale shape: binaryFile parallelizes by file; decode is narrow
    per-row work in bounded Arrow batches; nothing shuffles until the
    final (tiny) projection. ``pathGlobFilter``/``recursiveFileLookup``
    are the production knobs for object-store layouts."""
    import os

    import numpy as np
    import pandas as pd

    from self_healing_data_pipeline_spark.operators.codecs import (
        bmp_bytes_with_pixels,
    )
    from self_healing_data_pipeline_spark.operators.multimodal import (
        decode_pixels,
        png_bytes_with_pixels,
    )
    from self_healing_data_pipeline_spark.session import scratch_dir

    d = scratch_dir("binfiles", sf_dir)
    os.makedirs(d, exist_ok=True)
    for i in range(24):
        h, w = 16 + (i % 3) * 4, 20 + (i % 5) * 4
        yy, xx = np.mgrid[0:h, 0:w]
        px = ((yy * 7 + xx * 13 + i) % 256).astype(np.uint8)
        if i % 2 == 0:
            blob, ext = png_bytes_with_pixels(px[:, :, None]), "png"
        else:
            blob, ext = bmp_bytes_with_pixels(np.stack([px] * 3, -1)), "bmp"
        with open(os.path.join(d, f"img_{i:03d}_{w}x{h}.{ext}"), "wb") as f:
            f.write(blob)

    files = spark.read.format("binaryFile").load(d)
    schema = "name string, width int, height int, " \
             "pixel_mean double, dims_ok boolean"

    def decode_batches(it):
        for pdf in it:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(path)
                arr = decode_pixels(bytes(content))
                hh, ww = arr.shape[0], arr.shape[1]
                exp_w, exp_h = name.rsplit(".", 1)[0].split("_")[-1].split("x")
                out.append(
                    (
                        name,
                        ww,
                        hh,
                        float(np.mean(arr, dtype="float64")),
                        (ww == int(exp_w)) and (hh == int(exp_h)),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["name", "width", "height", "pixel_mean", "dims_ok"],
            )

    return (
        files.select("path", "content")
        .mapInPandas(decode_batches, schema)
        .orderBy("name")
    )
