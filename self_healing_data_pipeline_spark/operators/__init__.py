from self_healing_data_pipeline_spark.operators.aggregates import (
    pricing_summary,
    exact_stats,
    null_profile,
)
from self_healing_data_pipeline_spark.operators.dedup import (
    connected_components,
    dedup_exact,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard,
    ngram_jaccard_udf,
    normalize_text,
    shingles,
    simhash_pairs,
    simhash_signatures,
)
from self_healing_data_pipeline_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    jpeg_bytes,
    parse_image_dims,
    png_bytes,
)
from self_healing_data_pipeline_spark.operators.relational import (
    asof_join,
    asof_join_pandas,
    range_join,
    top_k,
)
from self_healing_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_ann_topk,
    similarity_join,
)
from self_healing_data_pipeline_spark.operators.skew import (
    salted_agg_count,
    salted_join,
    with_salt,
)
from self_healing_data_pipeline_spark.operators.text import (
    fingerprint64,
    lang_id,
    quality_score,
    token_count,
    top_terms,
)
from self_healing_data_pipeline_spark.operators.windows import keep_first, sessionize

__all__ = [
    "pricing_summary",
    "exact_stats",
    "null_profile",
    "connected_components",
    "dedup_exact",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard",
    "ngram_jaccard_udf",
    "normalize_text",
    "shingles",
    "simhash_pairs",
    "simhash_signatures",
    "extract_features",
    "frame_sample_plan",
    "jpeg_bytes",
    "parse_image_dims",
    "png_bytes",
    "asof_join",
    "asof_join_pandas",
    "range_join",
    "top_k",
    "brute_force_topk",
    "ivf_topk",
    "lsh_ann_topk",
    "similarity_join",
    "salted_agg_count",
    "salted_join",
    "with_salt",
    "fingerprint64",
    "lang_id",
    "quality_score",
    "token_count",
    "top_terms",
    "keep_first",
    "sessionize",
]
