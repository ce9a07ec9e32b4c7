"""Shared text-feature Column builders (pure built-in expressions).

Word 3-gram shingling used by the near-dup family (SURVEY.md §2.11
X2). Both the Spark expression and its DuckDB CTE twin live here so
the two derivations can only drift in one place.

The oracle-checked MinHash family lives in operators/dedup.py: one
md5 prefix per shingle (identical lowercase hex in Spark and DuckDB)
fed through integer universal-hash permutations — deterministic and
engine-independent (murmur/xxhash would be faster but are not
reproducible across the two engines; the q_dedup_near_fast twin
swaps in xxhash64 and drops the oracle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def shingles_expr(text_col: str = "text") -> Column:
    """Distinct word 3-gram shingles of a space-tokenized text column;
    texts with <3 tokens fall back to the whole text as one shingle.

    The token array is bound once via a nested lambda scope —
    referencing `split(...)` directly inside the transform lambda
    would re-tokenize the text for every sequence element, turning an
    O(tokens) expression into O(tokens²) per row (measured 2-3× on
    the whole near-dup pipeline at sf0.1). The binding trick:
    transform over a 1-element wrapper array gives the inner lambda a
    named reference `t` to the token array, evaluated exactly once."""
    return F.expr(
        f"""
        element_at(
          transform(array(split({text_col}, ' ')), t ->
            array_distinct(CASE WHEN size(t) >= 3 THEN
              transform(sequence(1, size(t) - 2),
                i -> concat_ws(' ', element_at(t, i), element_at(t, i+1), element_at(t, i+2)))
            ELSE array(concat_ws(' ', t)) END)
          ), 1)
        """
    )


# DuckDB twin: CTEs producing (doc_id, lang, sh) — one row per distinct
# shingle per document.
SHINGLES_SQL_CTE = """
    toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
    shing AS (
        SELECT doc_id, lang,
               list_distinct(CASE WHEN len(t) >= 3
                   THEN list_transform(range(1, len(t) - 1),
                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                   ELSE [array_to_string(t, ' ')] END) AS shs
        FROM toks),
    ex AS (SELECT doc_id, lang, unnest(shs) AS sh FROM shing)
"""


def hashed_shingles(docs):
    """DISTINCT (doc_id, shh) — each document's word-3-gram shingles
    as md5-prefix BIGINTs (15 hex chars, exact in a signed 64-bit on
    both engines).  The hash-rides-the-shuffle discipline shared by
    q_containment, q_gram_novelty, and the streaming novelty store:
    gram strings never leave the mapper.  DuckDB twin:
    ('0x' || substr(md5(sh), 1, 15))::BIGINT over the ex CTE."""
    return (
        docs.select("doc_id", F.explode(shingles_expr()).alias("sh"))
        .select(
            "doc_id",
            F.expr(
                "CAST(conv(substring(md5(sh), 1, 15), 16, 10) AS BIGINT)"
            ).alias("shh"),
        )
        .distinct()
    )
