from .tokenizers import (  # noqa: F401
    CODE_LANGS,
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    doc_length,
    tokenize,
    tokenize_code,
    tokenize_standard,
)
