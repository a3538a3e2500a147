"""Large-scale training-data pipeline operations.

Beyond the reference's observability operators, these are the ops a 100 TB
pretraining-data pipeline needs: deduplication (exact → embedding-based),
similarity search over embeddings, text analysis, and multimodal column
plumbing. All are DataFrame builders following the same operator contract
as vector_spark.operators.
"""

from vector_spark.dataops.dedup import (
    exact_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash,
    ngram_jaccard_pairs,
)
from vector_spark.dataops.similarity import brute_force_topk, lsh_topk, cosine_sim
from vector_spark.dataops.text import text_stats, language_id, token_count, fingerprint
