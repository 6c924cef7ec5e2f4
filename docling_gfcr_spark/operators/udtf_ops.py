"""Python UDTFs (Spark 4 user-defined TABLE functions).

The engine surface checklist (SURVEY §2B) covers scalar pandas UDFs, grouped
/ cogrouped maps and stateful streaming; UDTFs are the remaining Spark-4
user-function shape — one input row fanning out to N output rows with their
own schema, usable from SQL via ``LATERAL``. The resident example is the
training-pipeline chunker: split a document into fixed-size word windows
(context-window pieces for embedding/training), one output row per chunk.

Register once per session::

    register_udtfs(spark)
    spark.sql("SELECT doc_id, c.* FROM docs, LATERAL chunk_text(text, 40) c")
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk string, n_words int")
class ChunkText:
    """Fixed-size word chunking: yields ceil(n_words / chunk_words) rows per
    document, final chunk short. Empty/blank text yields no rows."""

    def eval(self, text: str, chunk_words: int):  # noqa: D102 (UDTF contract)
        if chunk_words is None:  # NULL chunk size: no rows, like NULL text
            return
        words = (text or "").split()
        w = max(1, int(chunk_words))
        for i in range(0, (len(words) + w - 1) // w):
            chunk = words[i * w : (i + 1) * w]
            yield i, " ".join(chunk), len(chunk)


def register_udtfs(spark) -> None:
    spark.udtf.register("chunk_text", ChunkText)
