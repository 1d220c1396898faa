from hadoop_3_3_6_spark.functions.text import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_counts,
)
from hadoop_3_3_6_spark.functions.dedup import (
    exact_dedup,
    minhash_signatures,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from hadoop_3_3_6_spark.functions.similarity import (
    cosine_topk_bruteforce,
    cosine_pairs_above,
    lsh_bucketed_topk,
)

__all__ = [
    "doc_fingerprint",
    "language_id",
    "quality_score",
    "token_counts",
    "exact_dedup",
    "minhash_signatures",
    "minhash_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "cosine_topk_bruteforce",
    "cosine_pairs_above",
    "lsh_bucketed_topk",
]
