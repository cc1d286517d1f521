"""Text-analysis operators for training-data curation (SURVEY.md §2.11).

All are single-pass, shuffle-free per-row transforms built from Catalyst
primitives (split / transform / aggregate / regexp) — the shapes that scale
linearly to 100 TB. No Python UDFs in any of them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.operators.dedup import normalize_text

# A compact stopword list for quality heuristics (language-agnostic core).
# Module-level (like LANG_MARKERS) so the DuckDB oracle twins build their
# regex from the SAME lists — no drift between engine and oracle.
_STOPWORDS = (
    "the a an and or of to in is it for on with as at by from that this be are was".split()
)

# Stopword-family markers for heuristic language ID; dict order is the
# tie-break precedence (earlier wins on equal scores).
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "de", "es"],
    "it": ["il", "che", "di", "non", "per"],
}

# BPE-ish token regex: words, numbers, or single punctuation marks —
# a deterministic proxy for subword token counting.
TOKEN_REGEX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens(col) -> Column:
    """Whitespace tokens of normalized text."""
    return F.split(normalize_text(col), " ")


def regex_tokens(col) -> Column:
    """BPE-ish regex tokenization (words / digit runs / punctuation)."""
    c = F.col(col) if isinstance(col, str) else col
    # idx=0 = whole match; the default idx=1 requires a capture group.
    return F.regexp_extract_all(c, F.lit(TOKEN_REGEX), 0)


def token_count(col, mode: str = "whitespace") -> Column:
    return F.size(tokens(col) if mode == "whitespace" else regex_tokens(col)).cast(
        "bigint"
    )


def _word_hits(norm_col, words: list[str]) -> Column:
    """Count occurrences of any marker word in normalized text via ONE
    codegen'd JVM regex pass — not an interpreted per-token array lambda
    (Catalyst HOF lambdas evaluate ~60k elements/s; regexp_count streams
    the string once)."""
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(norm_col, F.lit(pattern))


def quality_score(text_col, n_chars_col) -> Column:
    """Deterministic quality heuristics → score in [0, 1].

    Components: length band, alpha ratio, stopword hit-rate, mean word
    length band — the deterministic stand-in for the reference's LLM
    quality assessment (geminiService.ts:64 categories). Single-pass JVM
    expressions only (regex counts, no per-token lambdas).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    norm = normalize_text(c)
    n = F.col(n_chars_col).cast("double")
    n_toks = (F.length(norm) - F.length(F.regexp_replace(norm, " ", "")) + 1).cast(
        "double"
    )
    alpha = F.length(F.regexp_replace(c, "[^a-zA-Z]", "")).cast("double")
    alpha_ratio = F.when(F.length(c) > 0, alpha / F.length(c).cast("double")).otherwise(0.0)
    stop_hits = _word_hits(norm, _STOPWORDS).cast("double")
    stop_ratio = F.when(n_toks > 0, stop_hits / n_toks).otherwise(0.0)
    mean_wlen = F.when(n_toks > 0, n / n_toks).otherwise(0.0)
    len_ok = (n >= 100) & (n <= 20000)
    wlen_ok = (mean_wlen >= 3.0) & (mean_wlen <= 12.0)
    return (
        F.when(len_ok, 0.25).otherwise(0.0)
        + F.when(wlen_ok, 0.25).otherwise(0.0)
        + alpha_ratio * 0.25
        + F.least(stop_ratio * F.lit(2.5), F.lit(1.0)) * 0.25
    )


def lang_id(text_col) -> Column:
    """Heuristic language ID via stopword-family hit counting.

    One JVM regex count per language family, argmax (ties → 'und'). A real
    pipeline would swap in a model; the Spark shape (per-row map, no
    shuffle) is identical.
    """
    markers = LANG_MARKERS
    norm = normalize_text(text_col)
    scores = [(lang, _word_hits(norm, words)) for lang, words in markers.items()]
    best = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    for lang, s in reversed(scores):
        out = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def fingerprint64(text_col) -> Column:
    """64-bit document fingerprint: xxhash64 of normalized text (the
    rolling-hash style content signature used for exact-dup detection)."""
    return F.xxhash64(normalize_text(text_col))


def strided_spans(
    df: DataFrame,
    id_col: str,
    text_expr,
    span: int,
    stride: int,
    out_col: str = "span_text",
) -> DataFrame:
    """(id, pos, span_text) for every FULL ``span``-length character
    window at the given ``stride`` — the LINEAR, long-document-safe
    span extractor shared by the substring-dedup / dedup-explain /
    contamination keys (round-10 --longdoc tier fix, same pathology as
    q_doc_chunks).

    The naive explode-positions-then-``substring`` form is quadratic
    twice over on a long document: each span row carries the full text,
    and ``substring(text, pos, span)`` walks the UTF-8 string from the
    start to find the char offset (O(pos) per span — measured ~55 µs
    per deep substring on 300 KB docs). Here the text is split ONCE
    into gcd(span, stride)-char cells (single-pass ``(?s)(?<=\\G.{c})``
    regex), cells posexplode to rows, and each span is its lead-window
    cell concat — every cell touched O(1) times, one cell-grain
    exchange, text never duplicated. ``pos`` is the 1-based character
    position, exactly ``substring(text, pos, span)``'s convention, so
    downstream position arithmetic is unchanged."""
    from math import gcd

    from pyspark.sql import Window

    c = gcd(span, stride)
    k_cells = span // c
    step = stride // c
    cells = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(text_expr, rf"(?s)(?<=\G.{{{c}}})")
        ).alias("_ci", "_cell"),
    )
    w = Window.partitionBy(id_col).orderBy("_ci")
    span_txt = F.concat_ws(
        "",
        F.col("_cell"),
        *[
            F.coalesce(F.lead("_cell", j).over(w), F.lit(""))
            for j in range(1, k_cells)
        ],
    )
    return (
        cells.withColumn(out_col, span_txt)
        .where(
            (F.col("_ci") % step == 0) & (F.length(out_col) == span)
        )
        .select(
            F.col(id_col),
            (F.col("_ci") * c + 1).cast("bigint").alias("pos"),
            out_col,
        )
    )


def top_terms(docs: DataFrame, text_col: str = "text", k: int = 20) -> DataFrame:
    """Corpus-level term frequencies: explode tokens → count → top-k.

    Map-side partial aggregation keeps the shuffle at |vocab|, not |tokens|.
    """
    return (
        docs.select(F.explode(tokens(text_col)).alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(k)
    )
