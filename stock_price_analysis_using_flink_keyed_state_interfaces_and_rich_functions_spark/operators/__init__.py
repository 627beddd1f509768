from .stateful import (  # noqa: F401
    running_max,
    running_max_segmented,
    running_agg,
    final_max,
    segmented_row_number,
    tumbling_count_window_avg,
    rows_between_breaches,
    ewma,
    ewma_integer,
)
from .windows import (  # noqa: F401
    distributed_global_rank,
    distributed_running_sum,
    with_row_number,
    with_rank_columns,
    with_lag_lead,
    moving_avg,
    running_sum,
    range_running_sum,
    sessionize_by_gap,
)
from .joins import (  # noqa: F401
    equi_join,
    broadcast_join,
    semi_join,
    anti_join,
    asof_join,
    hamming_neighborhood_join,
    range_join_bucketed,
    interval_overlap_join,
    salted_join,
)
from .topk import ranked_top_n, top_n, top_k_per_group  # noqa: F401
from .timeseries import ohlc_bars, fill_forward, last_touch_attribution  # noqa: F401
from .basket import pair_lift  # noqa: F401
from .scd import scd2_merge  # noqa: F401
from .diagnostics import key_skew_stats  # noqa: F401
from .graph import triangle_stats  # noqa: F401
from .setops import (  # noqa: F401
    union_all,
    union_distinct,
    intersect,
    intersect_all,
    except_all,
    except_distinct,
    dedup_keep_first,
)
from .rollup import rollup_agg, cube_agg, pivot_agg, pivot_conditional, unpivot_longform  # noqa: F401
from .dedup import (  # noqa: F401
    exact_dedup,
    exact_dup_groups,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_band_rows,
    minhash_candidate_pairs,
    minhash_dedup_pairs,
    minhash_verified_pairs,
    dup_clusters,
    simhash,
    simhash_pairs,
    chunk_dup_ratio,
)
from .packing import pack_concat_chunks, pack_greedy_nextfit  # noqa: F401
from .sampling import (  # noqa: F401
    hash_bucket_hex,
    hash_sample,
    hash_sample_stratified,
    hash_split,
    hash_sample_by_rate,
    temperature_mixture_sample,
)
from .similarity import (  # noqa: F401
    brute_force_topk,
    cosine_dup_pairs,
    embedding_centroids,
    ivf_topk,
    lsh_bucketed_topk,
    portable_plane_signs,
    portable_simhash_chunks,
    portable_simhash_chunks_udf,
    portable_simhash_dup_pairs,
    quantize_embeddings,
)
from .text import (  # noqa: F401
    positional_postings,
    phrase_occurrences,
    subword_count,
    subword_tokens,
    token_count,
    with_text_stats,
    with_quality_score,
    lang_distribution,
    language_id,
    with_repetition_stats,
    contamination_hits,
    contamination_bloom,
    fingerprint_md5,
    fingerprint_ngram_min,
    with_vocab_stats,
    tfidf_top_terms,
    bm25_rank_from_stats,
    bm25_topk,
    chunk_tokens_overlap,
    unigram_logprob_scores,
    with_compression_ratio,
)
from .multimodal import (  # noqa: F401
    attach_payload,
    payload_metadata,
    resize_payload,
    decode_features,
    frame_sample,
)
