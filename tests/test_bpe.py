"""Determinism contract for operators/bpe.py (BPE training).

q_bpe_merges is rows-only at the driver (N-round recurrence, no SQL
twin).  The claim is carried here: the full training loop is
re-learned in pure Python from word frequencies extracted by DuckDB
— an independent engine end to end — and the merge tables must match
EXACTLY, including tie-breaks and pair frequencies.  The replay uses
re.sub with the same zero-width-delimited pattern, which scans
left-to-right non-overlapping exactly like Java's replaceAll, so
greedy merge semantics (``a a a`` → ``aa a``) agree by construction.
"""

from __future__ import annotations

import re
import sys
from collections import Counter
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from open_street_map_data_wrangling_spark.operators import bpe
from open_street_map_data_wrangling_spark.plans import load_all_queries

SF = "/root/testdata/sf0.01"


def _replay(sf_dir: str, steps: int):
    """(merges, final seqs) — training replay AND the encoded
    word-type state, so the application test shares one source of
    truth with the training test."""
    con = duckdb.connect()
    freqs = con.execute(
        "SELECT tok, count(*) FROM (SELECT unnest(string_split(text, ' ')) "
        f"AS tok FROM read_parquet('{sf_dir}/documents.parquet')) "
        "WHERE tok <> '' GROUP BY tok"
    ).fetchall()
    seqs = {" " + " ".join(w) + " ": int(f) for w, f in freqs}
    merges = []
    for step in range(1, steps + 1):
        pc: Counter = Counter()
        for seq, f in seqs.items():
            syms = seq.split()
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        # (freq DESC, left ASC, right ASC) — the engine's total order
        (l, r), f = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if f < 2:
            break
        merges.append((step, l, r, f))
        pat = re.compile(f"(?<= ){re.escape(l)} {re.escape(r)}(?= )")
        seqs = {
            pat.sub((l + r).replace("\\", "\\\\"), seq): fv
            for seq, fv in seqs.items()
        }
    return merges, seqs


def test_bpe_merges_match_pure_python_replay(spark):
    got = [
        (r["step"], r["left"], r["right"], r["pair_freq"])
        for r in load_all_queries()["q_bpe_merges"].spark(spark, SF).collect()
    ]
    assert got == _replay(SF, bpe._BPE_STEPS)[0]
    assert len(got) == bpe._BPE_STEPS  # fixture corpus has 8 mergeable pairs


def test_bpe_backslash_symbols_survive_merge(spark):
    """Java replacement strings eat unescaped backslashes; a learned
    symbol containing '\\' (or '$') must survive the rewrite verbatim.
    Corpus: '\\a \\a b$ b$' repeated — the top pair is ('\\', 'a'),
    and after the merge the next pair is ('b', '$'); if the
    replacement dropped the backslash, step 2's left symbol would be
    'a', not '\\a'."""
    docs = spark.createDataFrame(
        [(i, "\\a \\a b$ b$") for i in range(3)], "doc_id int, text string"
    )
    merges = bpe.train_bpe(spark, docs, steps=2)
    assert merges == [(1, "\\", "a", 6), (2, "b", "$", 6)]


def test_bpe_greedy_run_semantics():
    """The delimiter-lookaround pattern must merge runs left-to-right
    non-overlapping: 'a a a' -> 'aa a', 'a a a a' -> 'aa aa'."""
    pat = re.compile("(?<= )a a(?= )")
    assert pat.sub("aa", " a a a ") == " aa a "
    assert pat.sub("aa", " a a a a ") == " aa aa "


def test_bpe_encode_matches_pure_python_replay(spark):
    """q_bpe_encode (rows-only at the driver) re-proven end to end:
    encode the replayed final word-type state, count token usage
    weighted by word frequency, and the Spark top-15 vocabulary-usage
    report must match exactly — rank, token, length, and counts."""
    _, seqs = _replay(SF, bpe._BPE_STEPS)
    usage: Counter = Counter()
    for seq, f in seqs.items():
        for tok in seq.split():
            usage[tok] += f
    expected = [
        (i + 1, tok, len(tok), n)
        for i, (tok, n) in enumerate(
            sorted(usage.items(), key=lambda kv: (-kv[1], kv[0]))[
                : bpe._BPE_TOPK
            ]
        )
    ]
    got = [
        (r["rank"], r["token"], r["token_len"], r["n_occurrences"])
        for r in load_all_queries()["q_bpe_encode"].spark(spark, SF).collect()
    ]
    assert got == expected
    # the learned merges actually show up in the served vocabulary:
    # at least one top token is multi-character
    assert any(ln > 1 for _, _, ln, _ in got)
