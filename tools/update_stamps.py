"""Maintain STAMPS.json — per-query implementation fingerprints.

A driver stamp (green row in CORRECTNESS_r*.json) certifies one
specific implementation of a query. `__spark_entry__._ordered_specs`
treats a stamped query whose current fingerprint differs from the
recorded one as *modified* and rotates it back into the driver's
~50-entry verification window (after never-stamped queries, before
unchanged ones).

Run this right after a round's CORRECTNESS_r{N}.json lands — i.e. at
the START of the next round, before touching any query — so the
recorded fingerprint is the one the driver actually verified:

    python tools/update_stamps.py            # record missing stamps
    python tools/update_stamps.py --refresh q_foo ...  # re-record

Entries are only ever added for queries the driver has stamped;
deleting an entry (or editing the query) forces re-verification.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from open_street_map_data_wrangling_spark.plans import load_all_queries

STAMPS_PATH = os.path.join(os.path.dirname(entrymod.__file__), "STAMPS.json")


def main(argv: list[str]) -> int:
    refresh = set()
    if argv[:1] == ["--refresh"]:
        refresh = set(argv[1:])
    specs = load_all_queries()
    stamped = entrymod._stamped_names()
    recorded = entrymod._stamp_fingerprints()
    added, refreshed = [], []
    for name in sorted(stamped):
        spec = specs.get(name)
        if spec is None:
            continue
        fp = entrymod._fingerprint(spec)
        if name not in recorded:
            recorded[name] = fp
            added.append(name)
        elif name in refresh and recorded[name] != fp:
            recorded[name] = fp
            refreshed.append(name)
    with open(STAMPS_PATH, "w") as fh:
        json.dump(dict(sorted(recorded.items())), fh, indent=1)
        fh.write("\n")
    print(f"recorded {len(added)} new, refreshed {len(refreshed)}; "
          f"total {len(recorded)} stamps in {STAMPS_PATH}")
    if added:
        print("new:", ", ".join(added))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
