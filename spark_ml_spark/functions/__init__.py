from spark_ml_spark.functions.vector import cosine, dot, l2_norm, to_double_array
from spark_ml_spark.functions.text import (
    char_ngrams, punct_count, stopword_hits, ws_tokens,
)

__all__ = [
    "cosine", "dot", "l2_norm", "to_double_array",
    "char_ngrams", "punct_count", "stopword_hits", "ws_tokens",
]
