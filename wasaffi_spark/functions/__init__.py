"""Public column-function library.

Reusable Column-level building blocks exposed by the engine — all pure
JVM expressions (codegen-friendly, no Python in the data path):

- vector math: :func:`dot`, :func:`norm`, :func:`cosine`
- text: :func:`tokens`
- deterministic hashing for cross-engine parity: everything here builds
  on ``F.md5`` (identical in Spark/DuckDB — the engine's oracle story).
"""

from ..operators.similarity import _dot as dot  # noqa: F401
from ..operators.similarity import _norm as norm  # noqa: F401
from ..operators.similarity import cosine  # noqa: F401
from ..operators.text import tokens  # noqa: F401

__all__ = ["dot", "norm", "cosine", "tokens"]
