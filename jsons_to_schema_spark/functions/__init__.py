"""Reusable Catalyst column expressions — the engine's scalar/array function
library.  Everything here returns a Column built from pyspark.sql.functions
built-ins (JVM-side); none of it touches Python at execution time.

Grouped re-exports so users compose engine expressions à la carte:

    from jsons_to_schema_spark.functions import cosine, tokens, simhash64
    df.select(cosine("vec_a", "vec_b"))
"""

from ..operators.dedup import (  # noqa: F401
    minhash_from_shingles,
    minhash_signature,
    simhash64,
)
from ..operators.sample import sample_key  # noqa: F401
from ..operators.similarity import cosine, dot, norm  # noqa: F401
from ..operators.text import (  # noqa: F401
    bpe_token_count,
    dedup_consecutive,
    lang_scores,
    lines_array,
    pii_counts,
    redact_pii,
    shingles,
    shingles_from_tokens,
    token_count,
    tokens,
)

__all__ = [
    "bpe_token_count",
    "cosine",
    "dedup_consecutive",
    "dot",
    "lang_scores",
    "lines_array",
    "minhash_from_shingles",
    "minhash_signature",
    "norm",
    "pii_counts",
    "redact_pii",
    "sample_key",
    "shingles",
    "shingles_from_tokens",
    "simhash64",
    "token_count",
    "tokens",
]
