"""mediachain_indexer_ray — a Ray-Data-native entity-resolution (record linkage /
near-duplicate detection) engine for multi-turn conversation transcripts.

Built from scratch against the capability contract of ``mediachain/mediachain-indexer``
(see /root/repo/SURVEY.md and /root/repo/BASELINE.json): the reference's baseline
n-gram blocker, perceptual-hash candidate generation, and ``dedupe_batch`` pairwise
reranker are re-expressed transcript-natively as

    assembly  (groupby(conv_id) + stable turn sort)
    signatures (char-shingle MinHash + SimHash, vectorized map_batches)
    blocking  (MinHash-LSH band keys, salted + hot-block split)
    scoring   (actor-pool batched Jaro-Winkler / Levenshtein / SimHash-cosine)
    closure   (distributed hash-to-min connected components)

on ``ray.data.Dataset`` with zero-copy Arrow batches throughout.
"""

from mediachain_indexer_ray.config import Config

__all__ = ["Config"]
__version__ = "0.1.0"
