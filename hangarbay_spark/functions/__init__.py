"""Public column-function surface — every scalar/array operator the
engine defines, importable from one namespace (the engine's analog of
``pyspark.sql.functions``)::

    from hangarbay_spark import functions as HF
    df.select(HF.clean_text_expr("city"), HF.lang_id_expr("text"))

All are native Column expressions (JVM-side, codegen'd); none require
Python in the executor hot path.
"""

from hangarbay_spark.address import (
    clean_text_expr,
    combine_address_expr,
    owner_id_expr,
    standardize_owner_name_expr,
    standardize_state_expr,
    standardize_zip_expr,
)
from hangarbay_spark.operators.fts import tokenize_expr
from hangarbay_spark.operators.similarity import cosine_expr, sign_bucket_expr
from hangarbay_spark.operators.text import (
    bpe_token_count_expr,
    fingerprint_expr,
    lang_id_expr,
    punct_count_expr,
    quality_score_expr,
    shingles_expr,
    stopword_hits_expr,
    token_count_expr,
    tokens_expr,
)

__all__ = [
    "clean_text_expr",
    "combine_address_expr",
    "owner_id_expr",
    "standardize_owner_name_expr",
    "standardize_state_expr",
    "standardize_zip_expr",
    "tokenize_expr",
    "cosine_expr",
    "sign_bucket_expr",
    "bpe_token_count_expr",
    "fingerprint_expr",
    "lang_id_expr",
    "punct_count_expr",
    "quality_score_expr",
    "shingles_expr",
    "stopword_hits_expr",
    "token_count_expr",
    "tokens_expr",
]
