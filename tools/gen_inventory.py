"""Regenerate QUERIES.md — the one-stop registry inventory.

    python tools/gen_inventory.py

One row per QuerySpec: name, check mode, tags, first doc line.
Purely derived from plans/registry.py; rerun after adding queries.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from open_street_map_data_wrangling_spark.plans import load_all_queries


def main() -> int:
    specs = load_all_queries()
    lines = [
        "# Query inventory (auto-generated — tools/gen_inventory.py)",
        "",
        f"{len(specs)} registry entries; `oracle` = exact DuckDB twin "
        "(value + dtype hash at the driver), `rows-only` = no SQL twin "
        "by design (iterative / sketch / hash-family ops — each carries "
        "a pytest covering what the driver cannot).",
        "",
        "| query | check | tags | summary |",
        "| --- | --- | --- | --- |",
    ]
    for name in sorted(specs):
        s = specs[name]
        mode = "oracle" if s.oracle else "rows-only"
        doc = (s.doc or "").strip().splitlines()
        head = doc[0].strip() if doc else ""
        tags = ", ".join(s.tags)
        lines.append(f"| {name} | {mode} | {tags} | {head} |")
    rows_only = [n for n in sorted(specs) if not specs[n].oracle]
    if rows_only:
        lines += [
            "",
            "## Rows-only rationale",
            "",
            "Why each rows-only entry stays without a SQL twin (full "
            "docstrings — the deliberate-decision record the verdict "
            "audits):",
        ]
        for name in rows_only:
            doc = (specs[name].doc or "").strip()
            lines += ["", f"### {name}", "", doc]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(specs)} entries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
