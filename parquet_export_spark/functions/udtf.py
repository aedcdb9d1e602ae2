"""Python UDTF surface (SURVEY.md §2B.10).

The engine prefers JVM expressions everywhere (see operators/), but
exposes the Spark ≥3.5 UDTF mechanism for genuinely table-generating
user logic. ``NgramUDTF`` is the registered example: text -> one row
per n-gram with positions — the shape a custom parser/chunker plugs
into (a training-data pipeline's document chunker is this same UDTF
with a tokenizer in the body).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="ngram: string, pos: int")
class NgramUDTF:
    """One row per word n-gram of the input text (n fixed at 3 by the
    eval signature; generalize by passing n as a column)."""

    def eval(self, text: str, n: int = 3):  # noqa: D102
        if text is None:
            return
        toks = text.split(" ")
        for i in range(max(len(toks) - n + 1, 0)):
            yield (" ".join(toks[i : i + n]), i)


def register_udtfs(spark) -> None:
    """Make the UDTFs callable from SQL (``SELECT * FROM ngrams(...)``)."""
    spark.udtf.register("ngrams", NgramUDTF)
