"""Python UDTF surface: table functions producing rows per input row.

Spark 4's arrow-optimized Python UDTFs are the engine's user-defined
TABLE function story (SURVEY §2.7 covers UDF/UDAF; this completes the
triple). The example operator splits documents into sentences with
stable per-document numbering — the lateral-join shape every
row-expanding text stage (sentence split, paragraph chunking, sliding
context windows) follows.

Scale shape: a UDTF evaluates per input partition with no shuffle; the
lateral join preserves the parent row's columns without a join node.
The sentence regex is the Java∩RE2∩Python common dialect so the DuckDB
oracle reproduces the split byte for byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

SENTENCE_SPLIT_RE = r"[.!?]+ +"


@udtf(returnType="sent_idx int, sentence string, n_chars int")
class SplitSentences:
    """Yield (sent_idx, sentence, n_chars) per non-blank sentence.

    Mid-text terminal punctuation is consumed by the split; a trailing
    terminator (end of string, no following space) stays attached —
    deterministic and mirrored exactly by the SQL oracle.
    """

    def eval(self, text: str):
        import re

        idx = 0
        for part in re.split(SENTENCE_SPLIT_RE, text or ""):
            p = part.strip(" ")
            if p:
                idx += 1
                yield idx, p, len(p)


def split_sentences(
    spark: SparkSession, docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Lateral-join the UDTF over a document frame →
    (id, sent_idx, sentence, n_chars)."""
    spark.udtf.register("split_sentences_udtf", SplitSentences)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        f"""
        SELECT t.{id_col}, s.sent_idx, s.sentence, s.n_chars
        FROM _udtf_docs t, LATERAL split_sentences_udtf(t.{text_col}) s
        """
    )
