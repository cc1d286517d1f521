"""Round-8 batch 66 (SURVEY.md §2.11): ORDER-INDEPENDENT TABLE
CHECKSUMS (verify two copies of a 100 TB table agree WITHOUT moving or
sorting either — the reconciliation primitive behind replication
audits, migration cutovers and the read-back-verify pipeline stage)
and zlib COMPRESSIBILITY quality scoring (the Gopher-family filter:
highly compressible text is repetitive boilerplate, incompressible
text is noise/binary junk).

Exactness: the checksum folds each row's md5 into a 60-bit integer via
positional hex-digit arithmetic (the repo's portable-hash convention)
and SUMS them in DECIMAL(38,0) — commutative, so partition order can't
matter, and exact to ~1e38 (≈1e12 rows × 2^60 ≈ 1.2e30), emitted as a
digit string both engines render identically. Compression ratios are
not SQL-expressible (no zlib in DuckDB) → rows-only with in-row
bounds witnesses.
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf type hints resolve

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

_HEX = "0123456789abcdef"


def _hex_digit_value(col, i: int):
    """Value of the i-th (1-based) hex digit of a lowercase hex string,
    via position-in-alphabet arithmetic (portable across engines)."""
    return F.instr(F.lit(_HEX), F.substring(col, i, 1)) - 1


_CHECKSUM_TABLES = (
    ("region", ("r_regionkey", "r_name")),
    ("nation", ("n_nationkey", "n_name", "n_regionkey")),
    ("customer", ("c_custkey", "c_mktsegment", "c_nationkey")),
    ("orders", ("o_orderkey", "o_custkey", "o_orderstatus")),
)


def _oracle_checksum(tbl: str, cols: tuple) -> str:
    concat = ", '|', ".join(f"CAST({c} AS VARCHAR)" for c in cols)
    digits = " + ".join(
        f"(STRPOS('{_HEX}', SUBSTR(h, {i}, 1)) - 1) * {16 ** (15 - i)}"
        for i in range(1, 16)
    )
    return f"""
    SELECT '{tbl}' AS table_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0))
                AS VARCHAR) AS checksum
    FROM (SELECT {digits} AS v
          FROM (SELECT MD5(CONCAT({concat})) AS h FROM {tbl}))
    """


@query(
    "q_table_checksum",
    oracle="\nUNION ALL\n".join(
        _oracle_checksum(t, cs) for t, cs in _CHECKSUM_TABLES
    )
    + "\nORDER BY table_name",
)
def q_table_checksum(spark, sf_dir):
    """ORDER-INDEPENDENT content checksum per table: fold every row's
    md5 (over a '|'-joined column tuple) into a 60-bit integer and SUM
    — addition commutes, so ANY partitioning, file order or engine
    produces the same digits, which is the whole point: two sides of a
    replication/migration compare one (n_rows, checksum) row per table
    instead of shipping data. This is the content-level deepening of
    the pipeline's read-back-verify stage (the reference re-reads its
    loaded table to confirm row count; the checksum confirms VALUES).

    The sum runs in DECIMAL(38,0): exact to ~1e38 ≈ 1e12 rows × 2^60,
    so no modular reduction is needed at any realistic scale, and the
    result is emitted as a digit string both engines render
    identically. Scale shape: one scan + one row-local md5 + one
    partial-aggregated fold per table; no sort, no shuffle of rows —
    the exchange carries one partial sum per partition."""
    frames = []
    for tbl, cols in _CHECKSUM_TABLES:
        t = read_table(spark, sf_dir, tbl)
        h = F.md5(
            F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
        )
        # bigint from the first multiply: a 16^7-scale weight is an
        # int32 literal and 15 * 16^7 overflows INT under ANSI mode
        v = sum(
            _hex_digit_value(h, i).cast("bigint")
            * F.lit(16 ** (15 - i)).cast("bigint")
            for i in range(1, 16)
        )
        frames.append(
            t.select(v.cast("decimal(38,0)").alias("v")).agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum("v").cast("decimal(38,0)").cast("string").alias(
                    "checksum"
                ),
            ).select(
                F.lit(tbl).alias("table_name"), "n_rows", "checksum"
            )
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.orderBy("table_name")


@query("q_doc_compression_ratio")  # zlib: not SQL-expressible -> rows-only
def q_doc_compression_ratio(spark, sf_dir):
    """Gopher-family COMPRESSIBILITY quality signal: per language, the
    distribution of zlib deflate ratios (compressed/original bytes) —
    highly compressible documents are repetitive boilerplate, nearly
    incompressible ones are noise; both ends get filtered from
    training mixes. Computed in an Arrow-batched pandas UDF over
    stdlib zlib (level 6), aggregated to language grain with exact
    per-mille integer ratios (the float never crosses engines).

    In-row witnesses (rows-only key): ``ratios_in_range`` — every
    doc's ratio lies in (0, 1.6]: deflate's worst case is bounded
    (~11 bytes of header/stored-block overhead), so even the fixture's
    shortest docs stay under 1.6×, while a broken kernel (empty
    output, doubled bytes) flies past it — and ``compressible_corpus``
    — the language's aggregate ratio < 1 (word-pool text always
    deflates in bulk).

    Scale shape: one narrow mapInPandas-style projection (text →
    2 ints), then a language-grain partial aggregate; the shuffle
    carries 16 bytes per doc."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def deflate_len(texts: pd.Series) -> pd.Series:
        import zlib

        return texts.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), 6))
        )

    d = read_table(spark, sf_dir, "documents")
    sized = d.select(
        "lang",
        # octet_length, not length: the UDF compresses UTF-8 BYTES, so
        # raw_len must be bytes too or multi-byte text would inflate
        # per-doc ratios ~3x and flip the ratios_in_range witness
        # (round-8 ADVICE; identical on the ASCII fixture).
        F.octet_length(F.col("text")).cast("long").alias("raw_len"),
        deflate_len(F.col("text")).alias("zip_len"),
    ).select(
        "lang",
        "raw_len",
        "zip_len",
        # exact integer per-mille ratio per doc (floor) — engine-safe
        F.expr("zip_len * 1000 div raw_len").alias("ratio_pm"),
    )
    return (
        sized.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("raw_len").cast("bigint").alias("raw_bytes"),
            F.sum("zip_len").cast("bigint").alias("zip_bytes"),
            F.min("ratio_pm").cast("bigint").alias("min_ratio_pm"),
            F.max("ratio_pm").cast("bigint").alias("max_ratio_pm"),
            (
                (F.min("ratio_pm") > 0)
                & (F.max("ratio_pm") <= 1600)
            ).alias("ratios_in_range"),
            (F.sum("zip_len") < F.sum("raw_len")).alias(
                "compressible_corpus"
            ),
        )
        .orderBy("lang")
    )
