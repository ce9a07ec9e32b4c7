"""BPE tokenizer training — subword merge learning as an engine job.

Training a tokenizer is a first-class step of a training-data
pipeline, and its core loop (count adjacent symbol pairs, merge the
most frequent, repeat) is an iterative aggregate the engine should
own.  Production trainers (the original BPE formulation and its
descendants) operate on the WORD-TYPE frequency table, not the raw
corpus, and so does this: the corpus is scanned once into
(word, freq) — vocabulary-sized by Heaps' law, millions of rows at
100 TB, not billions — and each of the N merge rounds is one
explode+aggregate over that table plus a row-local regexp rewrite.
Per round the driver receives exactly ONE row (the winning pair),
the PQ-codebook bounded-collect convention.

Merging is greedy left-to-right non-overlapping, implemented with a
zero-width-delimited regexp — `(?<= )l r(?= )` — so consecutive
matches can share a delimiter: in the run `a a a` the first merge
consumes `a a` but the lookahead leaves the middle space in the
input, giving `aa a`, the standard BPE result.  Java and Python
regex engines agree on this scan, which is what lets
tests/test_bpe.py replay the whole training loop in pure Python
(word freqs pulled via DuckDB, merges re-learned with re.sub) and
assert the learned merge table EXACTLY — the rows-only +
bit-exact-replay honesty class of q_semantic_dedup and q_pagerank,
since an N-round recurrence has no SQL twin.

Determinism: pair selection orders by (freq DESC, left ASC,
right ASC) — a total order, so ties cannot flap across partitionings
or engines.  Training stops early if no pair occurs twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.catalog import load_table

_BPE_STEPS = 8


def _java_quote(s: str) -> str:
    """Literal-quote a learned symbol for a Java regex (\\Q…\\E, with
    the embedded-\\E escape, mirroring Pattern.quote)."""
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def word_type_freqs(docs: DataFrame) -> DataFrame:
    """One corpus scan → (word, freq): the vocabulary-sized table BPE
    training iterates on."""
    return (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )


def train_bpe(
    spark: SparkSession,
    docs: DataFrame,
    steps: int = _BPE_STEPS,
    return_state: bool = False,
):
    """Learn `steps` BPE merges from the corpus; returns
    (step, left, right, pair_freq) in learning order — or, with
    ``return_state=True``, the tuple (merges, encoded_wf) where
    encoded_wf is the final (seq, freq) word-type table with ALL
    merges applied: training's last state IS the encoded vocabulary,
    so the application path costs nothing extra.

    State per round is the word-type table with each word as a
    space-delimited symbol sequence (leading/trailing space so the
    merge regexp's lookarounds hold at the edges).  localCheckpoint
    per round keeps the plan flat across iterations (the
    connected-components discipline)."""
    wf = (
        word_type_freqs(docs)
        .select(
            F.concat(
                F.lit(" "), F.expr("regexp_replace(w, '(.)', '$1 ')")
            ).alias("seq"),
            "freq",
        )
        .localCheckpoint()
    )
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, steps + 1):
        top = (
            # single-symbol words carry no pairs (and sequence(0, -1)
            # would count DOWN in Spark — filter, don't guard)
            wf.where(F.expr("size(split(trim(seq), ' ')) >= 2"))
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(split(trim(seq), ' ')) - 2),"
                        " i -> struct(split(trim(seq), ' ')[i] AS l,"
                        " split(trim(seq), ' ')[i + 1] AS r))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").cast("bigint").alias("f"))
            .orderBy(F.desc("f"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["f"] < 2:
            break
        l, r, f = top[0]["l"], top[0]["r"], int(top[0]["f"])
        merges.append((step, l, r, f))
        pat = f"(?<= ){_java_quote(l)} {_java_quote(r)}(?= )"
        # Java replacement strings treat BOTH '\' and '$' as escapes
        # (Matcher.quoteReplacement quotes exactly these two); escaping
        # only '$' silently dropped backslashes from merged symbols
        # ("\x" -> "x"), diverging from the pure-Python replay.
        # Backslash must be doubled FIRST or the '$' escape's own
        # backslash would be re-escaped.
        repl = (l + r).replace("\\", "\\\\").replace("$", "\\$")
        wf = wf.select(
            F.regexp_replace("seq", pat, repl).alias("seq"),
            "freq",
        ).localCheckpoint()
    return (merges, wf) if return_state else merges


@query("q_bpe_merges", oracle=None, tags=("text", "iterative", "extension"))
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first 8 learned BPE merges over the documents corpus, with
    each pair's frequency at the time it was chosen — the tokenizer-
    training artifact (a merges.txt prefix) as a query result.
    Rows-only at the driver: the merge recurrence has no SQL twin;
    tests/test_bpe.py re-learns the same table in pure Python from
    DuckDB-extracted word frequencies and asserts exact equality."""
    merges = train_bpe(spark, load_table(spark, sf_dir, "documents"))
    return spark.createDataFrame(
        merges, "step int, left string, right string, pair_freq bigint"
    )


_BPE_TOPK = 15


@query("q_bpe_encode", oracle=None, tags=("text", "iterative", "extension"))
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION — the other half of the BPE story: after
    learning the 8 merges, report the {_BPE_TOPK} most-used tokens of
    the encoded corpus (occurrences weighted by word-type frequency,
    i.e. true corpus counts), with token length — the vocabulary-usage
    report a tokenizer-training pipeline ships with its merges.txt.
    Training's final word-type state IS the encoded vocabulary
    (return_state=True), so application adds one explode+aggregate
    over the vocabulary-sized table — no second corpus scan, no
    per-document re-encode; at 100 TB the encode of the CORPUS is a
    broadcast join of this table back onto words, never a re-run of
    the merge regexes per document.  Same honesty class as
    q_bpe_merges: rows-only at the driver (the merge recurrence has
    no SQL twin); tests/test_bpe.py re-encodes in pure Python from
    DuckDB word frequencies and asserts this exact table."""
    from pyspark.sql import Window as _W

    _, wf = train_bpe(
        spark, load_table(spark, sf_dir, "documents"), return_state=True
    )
    toks = (
        wf.select(
            F.explode(F.split(F.trim("seq"), " ")).alias("token"), "freq"
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.sum("freq").cast("bigint").alias("n_occurrences"))
    )
    top = (
        toks.orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(_BPE_TOPK)
        .withColumn(
            "rank",
            F.row_number()
            .over(_W.orderBy(F.desc("n_occurrences"), F.asc("token")))
            .cast("int"),
        )
    )
    return top.select(
        "rank", "token", F.length("token").cast("int").alias("token_len"),
        "n_occurrences",
    )
