"""Mongo-style aggregation-pipeline front door — SURVEY.md §3.1 EP3.

The reference's Mongo variant runs query suites as aggregation
pipelines (`$match → $group → $sort → $limit`). This module maps that
pipeline dialect 1:1 onto Catalyst logical-plan nodes:

    $match   → Filter          $group  → Aggregate
    $project → Project         $unwind → Generate(explode)
    $sort    → Sort            $limit  → GlobalLimit

Both front doors (this builder and spark.sql) converge on the same
Catalyst plan, so the optimizer treats them identically — exactly the
property the survey calls out. Supported operator subset mirrors what
the reference's notebooks actually use.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CMP = {
    "$gt": lambda c, v: c > v,
    "$gte": lambda c, v: c >= v,
    "$lt": lambda c, v: c < v,
    "$lte": lambda c, v: c <= v,
    "$ne": lambda c, v: c != v,
    "$in": lambda c, v: c.isin(*v),
    "$exists": lambda c, v: c.isNotNull() if v else c.isNull(),
}

_ACC = {
    "$sum": lambda arg: F.count("*") if arg == 1 else F.sum(_ref(arg)),
    "$avg": lambda arg: F.avg(_ref(arg)),
    "$min": lambda arg: F.min(_ref(arg)),
    "$max": lambda arg: F.max(_ref(arg)),
    "$addToSet": lambda arg: F.collect_set(_ref(arg)),
    "$count": lambda arg: F.count("*"),
}


def _ref(v: Any) -> Column:
    """'$field' → column reference (Mongo field-path syntax)."""
    if isinstance(v, str) and v.startswith("$"):
        return F.col(v[1:])
    return F.lit(v)


def _match_cond(spec: dict[str, Any]) -> Column:
    cond = None
    for field, crit in spec.items():
        c = F.col(field)
        if isinstance(crit, dict):
            for op, v in crit.items():
                term = _CMP[op](c, v)
                cond = term if cond is None else cond & term
        else:
            term = c == crit
            cond = term if cond is None else cond & term
    return cond if cond is not None else F.lit(True)


def build_pipeline(df: DataFrame, stages: list[dict[str, Any]]) -> DataFrame:
    """Interpret a Mongo-ish pipeline over a DataFrame. Each stage is
    a single-key dict, as in `collection.aggregate([...])`."""
    for stage in stages:
        (op, spec), = stage.items()
        if op == "$match":
            df = df.filter(_match_cond(spec))
        elif op == "$project":
            cols = []
            for name, val in spec.items():
                if val == 1 or val is True:
                    cols.append(F.col(name))
                elif isinstance(val, str) and val.startswith("$"):
                    cols.append(_ref(val).alias(name))  # rename / re-path
            df = df.select(*cols)
        elif op == "$unwind":
            field = spec[1:] if isinstance(spec, str) else spec["path"][1:]
            df = df.withColumn(field, F.explode(F.col(field)))
        elif op == "$group":
            key = spec["_id"]
            aggs = []
            for out_name, acc_spec in spec.items():
                if out_name == "_id":
                    continue
                (acc, arg), = acc_spec.items()
                aggs.append(_ACC[acc](arg).alias(out_name))
            if key is None:
                df = df.agg(*aggs)
            else:
                df = df.groupBy(_ref(key).alias("_id")).agg(*aggs)
        elif op == "$sort":
            df = df.orderBy(
                *[F.col(f).asc() if d == 1 else F.col(f).desc() for f, d in spec.items()]
            )
        elif op == "$limit":
            df = df.limit(spec)
        else:
            raise ValueError(f"unsupported pipeline stage: {op}")
    return df
