"""Column-expression builders shared by operators and queries.

The reference groups its scalar surface in SqlStdOperatorTable /
SqlLibraryOperators (SURVEY.md §2.4); the per-function battery lives in
queries/funcs.py. This package holds reusable *composite* builders (text
tokenization, hashing, vector math) used by the dedup / similarity /
text-analysis operators.
"""

from drill_calcite_spark.functions.text import (
    rolling_fingerprint,
    shingles,
    token_values,
    tokens,
)
from drill_calcite_spark.functions.vector import cosine, dot, l2_norm

__all__ = [
    "tokens", "shingles", "token_values", "rolling_fingerprint",
    "dot", "l2_norm", "cosine",
]
