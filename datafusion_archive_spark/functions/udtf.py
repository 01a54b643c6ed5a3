"""User-defined table functions.

The reference declares UDTF/array-UDF ambitions without any
implementation (``FunctionType::Aggregate`` variant at
``/root/reference/src/logicalplan.rs:25-28``; "Array UDFs" roadmap,
``ROADMAP.md:31``). On Spark 4 the lateral table-function surface is
native Python UDTFs; :func:`register_all` ships two:

- ``tokenize(text)`` — one row per whitespace token with its position
  (the UDTF twin of the text-analysis column functions).
- ``shingle(text, k)`` — one row per k-word shingle.

Prefer the column-function equivalents in the hot path (JVM-side);
UDTFs are for genuinely table-valued logic in SQL (``LATERAL``).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="pos: int, token: string")
class Tokenize:
    def eval(self, text: str):
        if text is None:
            return
        for i, tok in enumerate(text.split()):
            yield i, tok


@udtf(returnType="shingle: string")
class Shingle:
    def eval(self, text: str, k: int):
        if text is None or k is None or k < 1:
            return
        words = text.split()
        if len(words) < k:
            yield (" ".join(words),)
            return
        for i in range(len(words) - k + 1):
            yield (" ".join(words[i : i + k]),)


def register_all(spark: SparkSession) -> None:
    spark.udtf.register("tokenize", Tokenize)
    spark.udtf.register("shingle", Shingle)
