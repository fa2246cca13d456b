"""Content hashing (SURVEY.md section 2C row ``hash_sha1``).

The reference keys its whole memoization layer on
``sha1("FLAG:" + whitespaced + ":" + rawText)``
(src/edu/illinois/cs/cogcomp/archive/Identifier.java:63-70; "FLAG:" is a
literal prefix, whitespaced renders as true/false). Reproduced here
with JVM-side ``F.sha1`` so identifiers are computable without any Python
round-trip — at 100 TB this runs inside whole-stage codegen.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import Column


def record_identifier(raw_text: Column, whitespaced: Column | bool = False) -> Column:
    """Spark column expr reproducing Identifier.getId (Identifier.java:63-70)."""
    ws = F.lit(whitespaced) if isinstance(whitespaced, bool) else whitespaced
    flagged = F.concat(
        F.lit("FLAG:"),
        F.when(ws, F.lit("true")).otherwise(F.lit("false")),
        F.lit(":"),
        raw_text,
    )
    return F.sha1(flagged)


def record_identifier_py(raw_text: str, whitespaced: bool = False) -> str:
    """Driver-side twin of :func:`record_identifier` (for tests/oracles)."""
    flagged = f"FLAG:{'true' if whitespaced else 'false'}:{raw_text}"
    return hashlib.sha1(flagged.encode("utf-8")).hexdigest()
