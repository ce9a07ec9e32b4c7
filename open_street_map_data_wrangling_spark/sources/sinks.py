"""Sinks — SURVEY.md §2.1 S3/S4/S5.

Reference: csv.DictWriter per shaped table (S3), one JSON doc per
element (S4), sqlite3/pymongo load (S5). Engine equivalents are the
DataFrameWriter formats; parquet is the engine-default (columnar,
statistics, predicate-pushdown-able on re-read).

`partition_by` is the 100 TB lever: a layout partitioned on the query
key (e.g. event date) turns full scans into partition-pruned scans;
`bucket_by` co-locates join keys so repeated joins skip the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink (reference: UnicodeDictWriter) — header on, standard
    quoting; for interchange only (no stats, no pushdown)."""
    df.write.mode(mode).option("header", True).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (reference: the Mongo-variant dump) — one doc
    per row; nested structs/arrays serialize naturally."""
    df.write.mode(mode).json(path)


def write_table(
    df: DataFrame,
    name: str,
    mode: str = "overwrite",
    bucket_by: tuple[int, tuple[str, ...]] | None = None,
) -> None:
    """Managed-table sink (reference: sqlite3/pymongo load). With
    bucket_by=(n, cols), repeated equi-joins/aggs on cols skip their
    shuffle — the lakehouse version of the reference's DB indexes."""
    w = df.write.mode(mode)
    if bucket_by:
        n, cols = bucket_by
        w = w.bucketBy(n, *cols).sortBy(*cols)
    w.saveAsTable(name)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the second columnar interchange format Spark ships
    a native vectorized reader for; same pushdown/pruning behavior as
    parquet (stripe statistics instead of row-group statistics).
    Useful when downstream consumers are Hive/Trino-era ORC stacks."""
    df.write.mode(mode).orc(path)


def write_sqlite(
    df: DataFrame, db_path: str, table: str, batch_size: int = 10_000
) -> int:
    """SQLite sink — the reference's ACTUAL load target (S5: `data.py`
    writes CSVs, the case study loads them into SQLite and queries
    with a sqlite3 cursor).  A JDBC path is container-blocked (no
    driver jar, no server), but the stdlib sqlite3 module is present,
    so reference parity is closed with it directly: the DataFrame
    streams through `toLocalIterator()` into batched executemany
    INSERTs inside one transaction.

    Deliberately DRIVER-SIDE and documented as such: a SQLite file is
    a single-writer artifact — this is the small-export / parity path
    (the reference's own usage: a few hundred MB of shaped OSM
    tables), NOT a cluster sink.  Memory stays bounded at one
    partition (toLocalIterator) regardless of table size; at scale
    the managed-table / parquet sinks above are the real load path.
    Returns the row count written."""
    import sqlite3

    def q(ident: str) -> str:
        # double-quote identifiers (SQL standard, sqlite-supported) so
        # names with spaces, hyphens, or keyword collisions work
        return '"' + ident.replace('"', '""') + '"'

    cols = df.columns
    placeholders = ", ".join("?" for _ in cols)
    col_list = ", ".join(q(c) for c in cols)
    qtable = q(table)
    con = sqlite3.connect(db_path)
    try:
        con.execute(f"DROP TABLE IF EXISTS {qtable}")
        defs = []
        for f in df.schema.fields:
            t = f.dataType.simpleString()
            sql_t = (
                "INTEGER"
                if t in ("bigint", "int", "smallint", "tinyint", "boolean")
                else "REAL"
                if t in ("double", "float")
                else "TEXT"
            )
            defs.append(f"{q(f.name)} {sql_t}")
        con.execute(f"CREATE TABLE {qtable} ({', '.join(defs)})")
        n, batch = 0, []
        for row in df.toLocalIterator():
            batch.append(tuple(row))
            if len(batch) >= batch_size:
                con.executemany(
                    f"INSERT INTO {qtable} ({col_list}) VALUES ({placeholders})",
                    batch,
                )
                n += len(batch)
                batch = []
        if batch:
            con.executemany(
                f"INSERT INTO {qtable} ({col_list}) VALUES ({placeholders})", batch
            )
            n += len(batch)
        con.commit()
        return n
    finally:
        con.close()


def write_clean_corpus(
    docs: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = ("source",),
) -> None:
    """Materialize the boilerplate-stripped corpus (the write step
    behind q_boilerplate_strip's audit): documents rebuilt without
    cross-document 10-token chunks, written as parquet with the
    documents-table schema so every downstream operator (dedup, LM
    scoring, packing) runs on the cleaned corpus unchanged.
    Partitioned by source by default — the curation-pipeline read key.
    n_chars is recomputed from the rebuilt text, not copied."""
    from pyspark.sql import functions as F

    from ..operators.dedup import boilerplate_rewrite

    cleaned = boilerplate_rewrite(docs).select(
        "doc_id",
        F.col("new_text").alias("text"),
        "lang",
        "source",
        F.length("new_text").cast("bigint").alias("n_chars"),
    )
    write_parquet(cleaned, path, mode=mode, partition_by=partition_by)


def write_training_corpus(spark, sf_dir: str, path: str) -> None:
    """Materialize the full rewrite pipeline (curation.
    training_corpus: boilerplate strip → ExactSubstr dup-strip →
    mixture plan → shard plan) as the artifacts a training run
    consumes:

    * ``shards/`` — (doc_id, lang, source, text, n_tok, bytes)
      parquet PARTITIONED BY shard_id: the loader reads one
      near-uniform-byte directory per shard, and a resumable export
      re-writes single shards idempotently.
    * ``manifest/`` — the 5-stage (stage, n_docs, n_tokens, n_bytes)
      audit q_training_corpus hash-checks, persisted next to the
      data it describes (the provenance record reviewers diff
      between nightly runs).

    At 100 TB the partitionBy write is the only extra exchange over
    the plan itself, and it shuffles exactly the bytes being
    exported once — the same posture as write_clean_corpus."""
    from pyspark.sql import functions as F

    from ..operators.curation import training_corpus

    _, placed, manifest = training_corpus(spark, sf_dir)
    placed.select(
        "doc_id", "lang", "source", "text", "n_tok", "bytes", "shard_id"
    ).hint("rebalance", "shard_id").write.mode("overwrite").partitionBy(
        "shard_id"
    ).parquet(f"{path}/shards")
    manifest.write.mode("overwrite").parquet(f"{path}/manifest")
