from .bloom_join import bloom_join
from .dedup import (
    add_minhash_signature,
    add_simhash,
    dedup_clusters,
    exact_dedup,
    jaccard_col,
    lsh_candidate_pairs,
    minhash_dedup,
    minhash_dedup_pairs,
    simhash_near_dup_pairs,
    with_shingle_hashes,
)
from .multimodal import (
    extract_features,
    frame_sample_plan,
    synthesize_media,
)
from .similarity import (
    add_ivf_cluster,
    add_lsh_signature,
    ann_ivf_topk,
    ann_lsh_topk,
    cosine_sim_col,
    cosine_topk,
    embedding_near_dup_pairs,
    train_ivf_centroids,
)
from .skew import aqe_skew_configs, salted_join, skewed_keys, split_hot_join
from .text import (
    add_fingerprint,
    add_lang_id,
    add_text_stats,
    bpe_ish_token_count,
)

__all__ = [
    "add_fingerprint",
    "add_lang_id",
    "add_ivf_cluster",
    "add_lsh_signature",
    "add_minhash_signature",
    "add_simhash",
    "add_text_stats",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "aqe_skew_configs",
    "bloom_join",
    "bpe_ish_token_count",
    "cosine_sim_col",
    "cosine_topk",
    "dedup_clusters",
    "embedding_near_dup_pairs",
    "exact_dedup",
    "extract_features",
    "frame_sample_plan",
    "jaccard_col",
    "lsh_candidate_pairs",
    "minhash_dedup",
    "minhash_dedup_pairs",
    "salted_join",
    "simhash_near_dup_pairs",
    "skewed_keys",
    "split_hot_join",
    "synthesize_media",
    "train_ivf_centroids",
    "with_shingle_hashes",
]
