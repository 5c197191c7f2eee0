from .bm25 import B, K1, SCORE_DECIMALS, idf, rounded, term_score, tf_norm  # noqa: F401
