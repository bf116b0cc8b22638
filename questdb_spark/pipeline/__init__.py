"""Training-data pipeline operators: dedup (exact / Jaccard / MinHash-LSH /
SimHash / clusters), similarity search (cosine top-k, LSH and IVF ANN),
text analysis, multimodal plumbing."""

from .dedup import (
    dedup_clusters, exact_dedup_groups, minhash_lsh_candidates, minhash_signature,
    ngram_jaccard_pairs, simhash, simhash_hamming,
)

__all__ = [
    "dedup_clusters", "exact_dedup_groups", "minhash_lsh_candidates",
    "minhash_signature", "ngram_jaccard_pairs", "simhash", "simhash_hamming",
]
