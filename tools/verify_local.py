"""Local mimic of the driver's correctness gate.

Runs every registered QuerySpec at a given sf dir and compares the
Spark result against the DuckDB oracle: row count + sorted column
names + order-insensitive value compare (floats with tolerance —
stricter than the driver's hash, so passing here predicts passing
there).

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from open_street_map_data_wrangling_spark.plans import load_all_queries
from open_street_map_data_wrangling_spark.session import get_spark
from open_street_map_data_wrangling_spark.sources.catalog import TABLES

REL_TOL = 1e-9
ABS_TOL = 1e-9
# Generous per-oracle watchdog (a healthy oracle finishes in <5 s at
# sf0.1; the failure mode this guards — exponential CTE inlining —
# runs for hours).  Generosity also keeps the cancel race harmless:
# a timer that fires between fetchall and cancel would poison the
# NEXT statement, so it must never fire on a healthy query.
import os as _os

ORACLE_TIMEOUT_SEC = int(_os.environ.get("VERIFY_ORACLE_TIMEOUT", "300"))


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    if hasattr(v, "asDict"):  # Row
        return tuple(sorted((k, _norm(x)) for k, x in v.asDict().items()))
    return v


def _rows(cols, records):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in records]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


def _cell_eq(a, b):
    if isinstance(a, float) and isinstance(b, (int, float)):
        return math.isclose(a, float(b), rel_tol=REL_TOL, abs_tol=ABS_TOL)
    if isinstance(b, float) and isinstance(a, (int, float)):
        return math.isclose(float(a), b, rel_tol=REL_TOL, abs_tol=ABS_TOL)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cell_eq(x, y) for x, y in zip(a, b))
    return a == b


def _norm_type(t: str) -> str:
    t = t.lower()
    if t in ("integer", "int", "int32", "smallint", "tinyint"):
        return "int"
    if t in ("bigint", "long", "int64", "hugeint"):
        return "bigint"
    if t in ("double", "float", "real") or t.startswith("decimal"):
        return "float"
    if t.startswith(("varchar", "string", "char")):
        return "str"
    if t.startswith("bool"):
        return "bool"
    if "timestamp" in t:
        return "ts"
    if t.startswith(("array", "list")) or t.endswith("[]"):
        return "list"
    return t


def compare(spark_df, duck_rel, duck_types=None):
    s_cols = list(spark_df.columns)
    s_recs = [tuple(r) for r in spark_df.collect()]
    d_cols = list(duck_rel.columns)
    d_recs = duck_rel.fetchall()
    errs = []
    if sorted(s_cols) != sorted(d_cols):
        errs.append(f"schema: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return errs
    if duck_types is not None:
        sd = {c: _norm_type(t) for c, t in spark_df.dtypes}
        for c, t in duck_types.items():
            if sd.get(c) != _norm_type(t):
                errs.append(f"dtype[{c}]: spark={sd.get(c)} duck={_norm_type(t)}")
        if errs:
            return errs
    if len(s_recs) != len(d_recs):
        errs.append(f"rows: spark={len(s_recs)} duck={len(d_recs)}")
    if errs:
        return errs
    sr, dr = _rows(s_cols, s_recs), _rows(d_cols, d_recs)
    bad = 0
    for i, (a, b) in enumerate(zip(sr, dr)):
        if not all(_cell_eq(x, y) for x, y in zip(a, b)):
            bad += 1
            if bad <= 3:
                errs.append(f"row {i}: spark={a!r} duck={b!r}")
    if bad:
        errs.append(f"{bad} mismatched rows total")
    return errs


def main():
    args = [a for a in sys.argv[1:]]
    plain = "--plain" in args
    args = [a for a in args if a != "--plain"]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a]

    # Retention-policy tick (documented in tools/cache_gc.py): every
    # correctness pass sweeps index-cache artifacts whose whole
    # prefix group is >7 days stale, so content-tagged dirs stranded
    # by module edits can't accumulate unbounded across rounds.
    try:
        from cache_gc import collect as _gc_collect

        _gc_collect()
    except Exception as exc:  # GC must never block verification
        print(f"cache-gc skipped: {exc}")

    specs = load_all_queries()
    if names:
        specs = {k: v for k, v in specs.items() if k in names}

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    if plain:
        # Maximum driver fidelity: a PLAIN session (none of our
        # builder confs — static conf differences included) running
        # the queries through the __spark_entry__ wrappers exactly as
        # the external verify driver does (apply_runtime_conf is the
        # wrapper's job, not the session's).
        import __spark_entry__ as entrymod
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
        wrapped = entrymod.queries()

        class _WrapSpec:
            def __init__(self, name, spec):
                self.spark = wrapped[name]
                self.oracle = spec.oracle

        specs = {n: _WrapSpec(n, s) for n, s in specs.items() if n in wrapped}
    else:
        spark = get_spark("verify-local")
    passed = failed = rows_only = 0
    for name, spec in sorted(specs.items()):
        t0 = time.time()
        watchdog = None
        try:
            df = spec.spark(spark, sf_dir)
            if spec.oracle is None:
                n = df.count()
                print(f"ROWSONLY {name}: {n} rows ({time.time()-t0:.1f}s)")
                rows_only += 1
                continue
            # Oracle watchdog: an oracle that plans pathologically
            # (the unrolled-recurrence lesson — DuckDB inlines a
            # twice-referenced CTE per reference, so a missing
            # AS MATERIALIZED turns 6 iterations into 2^6 subplan
            # copies) must FAIL this one query, not hang the whole
            # sweep.  duckdb.interrupt() aborts the running statement;
            # the timer is cancelled on the normal path.
            import threading

            watchdog = threading.Timer(ORACLE_TIMEOUT_SEC, con.interrupt)
            watchdog.start()
            duck_types = {
                r[0]: r[1] for r in con.execute(f"DESCRIBE {spec.oracle}").fetchall()
            }
            errs = compare(df, con.sql(spec.oracle), duck_types)
        except Exception as e:
            errs = [f"EXCEPTION {type(e).__name__}: {e}"]
        finally:
            if watchdog is not None:
                watchdog.cancel()
        if errs:
            failed += 1
            print(f"FAIL {name} ({time.time()-t0:.1f}s)")
            for e in errs[:6]:
                print(f"   {e}")
        else:
            passed += 1
            print(f"PASS {name} ({time.time()-t0:.1f}s)")
    print(f"\n{passed} passed, {failed} failed, {rows_only} rows-only")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
