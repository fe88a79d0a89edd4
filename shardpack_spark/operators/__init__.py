"""Library operators with no single-call Catalyst equivalent.

Each is a DataFrame -> DataFrame function built from Catalyst built-ins
(joins / windows / higher-order functions) — no custom plan rules, no
driver-side collects, shard-parallel by construction.
"""

from shardpack_spark.operators.approx import (
    approx_distinct_rollup,
    cms_build,
    cms_estimate,
    cms_merge,
    distinct_sketches,
    rollup_sketches,
)
from shardpack_spark.operators.asof import asof_join
from shardpack_spark.operators.classifier import (
    hashed_classifier_scores,
    hashed_features,
    train_hashed_classifier,
)
from shardpack_spark.operators.dedup import (
    char_shingles,
    connected_components,
    exact_dedup,
    filter_candidates_by_signature,
    incremental_near_dup,
    jaccard_pairs_exact,
    minhash_lsh_candidates,
    minhash_lsh_candidates_against,
    minhash_signatures,
    simhash,
    simhash_near_pairs,
    substring_dedup,
)
from shardpack_spark.operators.graph import out_degrees, pagerank
from shardpack_spark.operators.layout import morton_interleave, zorder_layout
from shardpack_spark.operators.packing import (
    materialize_sequences,
    pack_sequences,
    packing_stats,
)
from shardpack_spark.operators.sampling import (
    cap_per_group,
    hash_sample,
    hash_sample_n,
    hash_split,
    shuffle_rows,
    stratified_sample,
    weighted_sample_n,
)
from shardpack_spark.operators.profile import (
    frequent_values,
    histogram,
    numeric_quantiles,
    profile_table,
)
from shardpack_spark.operators.analytics import funnel, gap_fill, retention
from shardpack_spark.operators.quantization import (
    ivfpq_build,
    ivfpq_topk,
    pq_decode_expr,
    pq_encode,
    pq_topk,
    pq_train,
)
from shardpack_spark.operators.normalize import (
    clean_text,
    clean_text_expr,
    compression_signals,
)
from shardpack_spark.operators.ranges import interval_join
from shardpack_spark.operators.search import (
    build_inverted_index,
    search_bm25,
    search_terms,
    term_stats,
)
from shardpack_spark.operators.sessionize import sessionize
from shardpack_spark.operators.similarity import (
    assign_to_centroids,
    cosine_scores,
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_topk,
    rp_lsh_topk,
)
from shardpack_spark.operators.tokenizer import (
    bpe_decode_tokens,
    bpe_encode,
    bpe_train,
    encode_word,
)
from shardpack_spark.operators.skew import bucketed_join, salted_join, write_bucketed
from shardpack_spark.operators.multimodal import (
    decode_msgpack_entries,
    decode_npy_entries,
    audio_features,
    decode_json_entries,
    decode_text_entries,
    explode_entries,
    image_features,
    resize_images,
    sample_video_frames,
)
from shardpack_spark.operators.text import (
    char_lm_scores,
    chunk_documents,
    fingerprints,
    gopher_quality_filter,
    lang_scores,
    line_dedup,
    ngram_contamination,
    quality_scores,
    repetition_signals,
    split_sentences,
    tf_idf,
    token_counts,
    train_char_lm,
)

__all__ = [
    "build_inverted_index",
    "cap_per_group",
    "clean_text",
    "clean_text_expr",
    "compression_signals",
    "cms_build",
    "cms_estimate",
    "cms_merge",
    "term_stats",
    "ivfpq_topk",
    "ivfpq_build",
    "pq_train",
    "pq_topk",
    "pq_encode",
    "pq_decode_expr",
    "tf_idf",
    "repetition_signals",
    "ngram_contamination",
    "gopher_quality_filter",
    "hashed_classifier_scores",
    "hashed_features",
    "sample_video_frames",
    "resize_images",
    "image_features",
    "explode_entries",
    "decode_text_entries",
    "decode_json_entries",
    "decode_msgpack_entries",
    "decode_npy_entries",
    "audio_features",
    "bpe_decode_tokens",
    "bpe_encode",
    "bpe_train",
    "approx_distinct_rollup",
    "asof_join",
    "assign_to_centroids",
    "bucketed_join",
    "char_lm_scores",
    "char_shingles",
    "chunk_documents",
    "connected_components",
    "cosine_scores",
    "cosine_topk",
    "embedding_near_dup_pairs",
    "encode_word",
    "exact_dedup",
    "filter_candidates_by_signature",
    "distinct_sketches",
    "fingerprints",
    "gap_fill",
    "funnel",
    "frequent_values",
    "hash_sample",
    "hash_sample_n",
    "hash_split",
    "histogram",
    "incremental_near_dup",
    "interval_join",
    "ivf_topk",
    "jaccard_pairs_exact",
    "lang_scores",
    "line_dedup",
    "materialize_sequences",
    "minhash_lsh_candidates",
    "minhash_lsh_candidates_against",
    "minhash_signatures",
    "morton_interleave",
    "numeric_quantiles",
    "out_degrees",
    "pack_sequences",
    "pagerank",
    "packing_stats",
    "profile_table",
    "quality_scores",
    "retention",
    "rollup_sketches",
    "rp_lsh_topk",
    "salted_join",
    "search_bm25",
    "search_terms",
    "sessionize",
    "shuffle_rows",
    "simhash",
    "split_sentences",
    "stratified_sample",
    "simhash_near_pairs",
    "substring_dedup",
    "token_counts",
    "weighted_sample_n",
    "zorder_layout",
    "train_char_lm",
    "train_hashed_classifier",
    "write_bucketed",
]
