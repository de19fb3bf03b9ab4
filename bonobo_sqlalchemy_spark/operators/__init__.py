from .asof import as_of_join
from .dedup import (
    connected_components,
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    survivors,
)
from .contamination import benchmark_overlap
from .graphalgo import pagerank_integer, pagerank_personalized_integer
from .sketch import cms_build, cms_estimate, cms_merge
from .export import (
    shard_manifest,
    update_training_shards,
    verify_training_shards,
    write_training_shards,
)
from .multimodal import attach_binary_payload, extract_features
from .packing import pack_sequences
from .rangejoin import interval_join
from .scale import bucketed_join, salted_join, scalar_attach, write_bucketed
from .selection import bm25_topk, dsir_log_weights, dsir_select, threshold_sweep
from .similarity import cosine_topk, ivf_topk, lsh_topk
from .upsert import InsertOrUpdate

__all__ = [
    "InsertOrUpdate",
    "pagerank_integer",
    "pagerank_personalized_integer",
    "cms_build",
    "cms_estimate",
    "cms_merge",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "embedding_near_dup_pairs",
    "survivors",
    "connected_components",
    "as_of_join",
    "interval_join",
    "pack_sequences",
    "benchmark_overlap",
    "cosine_topk",
    "lsh_topk",
    "ivf_topk",
    "attach_binary_payload",
    "extract_features",
    "salted_join",
    "write_bucketed",
    "bucketed_join",
    "scalar_attach",
    "dsir_log_weights",
    "dsir_select",
    "bm25_topk",
    "threshold_sweep",
    "write_training_shards",
    "verify_training_shards",
    "update_training_shards",
    "shard_manifest",
]
