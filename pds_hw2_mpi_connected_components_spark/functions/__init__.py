from .text import (  # noqa: F401
    token_count,
    token_chars,
    occurrences,
    stopword_hits,
    quality_score,
    lang_id,
    fingerprint_md5,
    portable_token_hash,
)
from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
