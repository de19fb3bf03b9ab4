"""Python UDTFs: the engine's user-defined *table* function surface.

Reference parity: every bonobo graph node is a user-defined transform, and
generator nodes are UDTF-like — one row in, N rows out (the reference's
``Select.__call__`` yields many rows per page, ``readers.py:72-75``; example
generator sources at ``tests/test_integration.py:130-134``). Spark 4 exposes
that shape natively as Python UDTFs (``@udtf`` + lateral join), so the
engine ships one as the canonical pattern.

Performance posture (SURVEY §2.4 / pyspark guide): UDTFs are the slow path —
per-row Python with pickled (or Arrow) transfer. The codegen equivalent of
:class:`ChunkDocument` is the ``text_chunks`` registry query
(``queries/datapipe3.py``): explode + slice, fully JVM-side, ~10-100x
faster. Use a UDTF only when the row-expansion logic genuinely cannot be
expressed with built-ins; ``z_udtf_chunks`` exists to prove the two paths
agree, not to replace the fast one.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id: bigint, n_chunk_tokens: bigint, chunk_text: string")
class ChunkDocument:
    """Split a document into fixed-token-budget chunks (UDTF form).

    Semantics match the codegen ``text_chunks`` query: whitespace-split,
    ``ceil(len/budget)`` chunks, last chunk ragged. Empty/blank text yields
    no rows (a generator that never yields — the reference's empty-page
    stop, ``readers.py:69-70``).
    """

    def eval(self, text: str, budget: int):
        words = (text or "").strip().split()
        for ci in range(0, -(-len(words) // budget)):
            piece = words[ci * budget : (ci + 1) * budget]
            yield ci, len(piece), " ".join(piece)


def register_udtfs(spark) -> None:
    """Register the engine's UDTFs for SQL use (idempotent)."""
    spark.udtf.register("chunk_doc", ChunkDocument)
