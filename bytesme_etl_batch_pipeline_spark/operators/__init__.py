"""Operator library (SURVEY §2). Every operator is a pure
``DataFrame -> DataFrame`` function — composable, streaming-compatible.

The names below are the engine's public operator API; see COVERAGE.md for
the reference-operator → implementation map.
"""

from .aggregate import (  # noqa: F401
    collapse_first_wins,
    dense_ids,
    group_sequence,
    hash_ids,
    salted_count,
    sequence_code,
)
from .bloom import (  # noqa: F401
    bloom_decontaminate,
    bloom_might_contain,
    bloom_prefiltered_anti_join,
    build_bloom,
)
from .categorize import build_rule_cascade, standardize_categories  # noqa: F401
from .dedup import (  # noqa: F401
    anti_join,
    dedup_distinct,
    dedup_keep_first,
    duplicate_report,
    incremental_dedup,
)
from .embed import HashEmbedder, embed_column  # noqa: F401
from .enrich import enrich_products  # noqa: F401
from .joins import (  # noqa: F401
    asof_join,
    lookup_map_join,
    range_join,
    resolve_key,
    salted_join,
    zip_join,
)
from .llm import enrich_descriptions  # noqa: F401
from .multimodal import decode_and_featurize, resize_images, sample_frames  # noqa: F401
from .neardup import (  # noqa: F401
    exact_dedup_by_content,
    minhash_lsh_pairs,
    minhash_signatures,
    neardup_filter,
    ngram_jaccard_pairs,
    segment_dedup,
    simhash_hamming_pairs,
)
from .normalize import explode_piped_pairs, snowflake_split  # noqa: F401
from .similarity import (  # noqa: F401
    cosine_similarity,
    l2_distance,
    pairs_above_threshold,
    topk_ann_lsh,
    topk_brute_force,
    topk_ivf,
    train_ivf_centroids,
)
from .template import product_document, template_document  # noqa: F401
from .sampling import (  # noqa: F401
    deterministic_sample,
    shuffle_shards,
    stratified_sample,
    train_val_test_split,
    weighted_sample,
)
from .textops import (  # noqa: F401
    fingerprint,
    fold_accents,
    lang_id,
    normalize_unicode,
    quality_features,
    simhash,
    token_count_regex,
    token_count_ws,
    vi_tokenize_column,
    winnow_fingerprints,
)
