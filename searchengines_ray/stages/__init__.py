"""Training-data pipeline operators (public surface).

Every operator takes a Ray ``Dataset`` and returns a ``Dataset`` (or a
small pandas result for pair lists) — see each module for the scale
design notes.
"""

from .dedup import (  # noqa: F401
    dedup_drop_ids,
    exact_dedup,
    embedding_neardup_pairs,
    line_dedup,
    minhash_candidate_pairs,
    minhash_candidate_pairs_ds,
    minhash_dedup_pairs,
    minhash_dedup_pairs_ds,
    minhash_dedup_survivors,
    minhash_verify_pairs,
    minhash_verify_pairs_ds,
    ngram_jaccard,
    simhash_dup_pairs,
)
from .graph import connected_components, nonroot_ids  # noqa: F401
from .joins import asof_join, interval_join  # noqa: F401
from .multimodal import decode_images, sample_frames  # noqa: F401
from .similarity import (  # noqa: F401
    IVFIndex,
    cosine_similarity_join,
    cosine_topk,
)
from .rank import grouped_quantiles, grouped_topk  # noqa: F401
from .sample import hash_sample, hash_split, sample_mask  # noqa: F401
from .text import (  # noqa: F401
    fingerprints,
    lang_id,
    ngram_counts,
    pii_redact,
    quality_scores,
    repetition_signals,
    token_counts,
    unigram_lm_scores,
)
from .windows import (  # noqa: F401
    hopping_window_agg,
    sessionize,
    tumbling_window_agg,
)
