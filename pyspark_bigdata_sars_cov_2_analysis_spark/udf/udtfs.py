"""Python UDTFs (Spark 3.5+ table functions) — the extensibility twin of
the native expression operators.

UDTF ``eval`` is row-at-a-time Python, so nothing here sits on a hot
path; the native formulations (``functions/text.chunk_array`` for
chunking) are the defaults, and each UDTF is equivalence-tested against
its twin. The surface exists because a real deployment will eventually
need a table function no expression can say (calling a tokenizer library,
yielding variable-arity rows from an opaque parser) — this is the
registered, tested seam for that.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx bigint, chunk string")
class ChunkText:
    """Overlapping token-window chunker — semantics identical to
    functions/text.chunk_array (window tokens per chunk, stride apart,
    normalized whitespace/case, empty docs yield nothing).

    The normalization replicates chunk_array's EXACT Spark expression
    chain — ``regexp_replace(trim(lower(col)), r"\\s+", " ")`` then
    ``split(norm, " ")`` — character class included: Java's ``\\s`` is
    ASCII-only, while Python's ``str.split()`` tokenizes on ALL Unicode
    whitespace, so a document containing NBSP chunked differently in
    the two twins (review r14); Spark ``trim`` strips only the ASCII
    space, mirrored by ``strip(" ")``."""

    def eval(self, text: str, window: int, stride: int):
        if text is None:
            return
        import re

        norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", text.lower().strip(" "))
        if not norm.strip(" "):
            # post-collapse whitespace is only ' ', so the ASCII strip
            # is complete: a tab/newline-only doc yields no chunks,
            # matching chunk_array's trimmed guard (review r15)
            return
        toks = norm.split(" ")
        for i, start in enumerate(range(0, len(toks), stride)):
            yield i, " ".join(toks[start : start + window])


def register_udtfs(spark) -> None:
    """Idempotent SQL registration: ``SELECT * FROM chunk_text(...)``."""
    spark.udtf.register("chunk_text", ChunkText)
