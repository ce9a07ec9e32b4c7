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


# Meta entry in STAMPS.json recording which round's CORRECTNESS file
# has been consumed for auto-refresh. Its value is a dict, so
# _stamp_fingerprints (which keeps only str values) never mistakes it
# for a stamp.
_META_KEY = "__meta__"


def _latest_round_green() -> tuple[str | None, set[str]]:
    """(filename, names) green in the MOST RECENT CORRECTNESS file:
    the driver just verified the current implementation of these, so
    their recorded fingerprint auto-refreshes ONCE per round (without
    this, a shared-helper edit that re-queued the whole registry would
    keep every re-verified query in the 'modified' rotation forever —
    the current fingerprint only hashes with the helper edit in place,
    but the stamp predates it).  The once-per-round sentinel matters:
    this tool runs at round START, before any query edit, so "current
    source" is exactly what the driver verified; a second run later in
    the round must NOT refresh again (it would certify mid-round
    edits the driver never saw)."""
    import glob

    paths = sorted(glob.glob(os.path.join(os.path.dirname(STAMPS_PATH), "CORRECTNESS_r*.json")))
    if not paths:
        return None, set()
    try:
        with open(paths[-1]) as fh:
            rows = json.load(fh)
    except (OSError, ValueError):
        return None, set()
    green = {
        n
        for n, rec in rows.items()
        if isinstance(rec, dict)
        and (rec.get("hash_match") is True or rec.get("err") == "no_oracle")
    }
    return os.path.basename(paths[-1]), green


def main(argv: list[str]) -> int:
    refresh = set()
    if argv[:1] == ["--refresh"]:
        refresh = set(argv[1:])
    try:
        with open(STAMPS_PATH) as fh:
            raw = json.load(fh)
    except (OSError, ValueError):
        raw = {}
    meta = raw.get(_META_KEY) if isinstance(raw.get(_META_KEY), dict) else {}
    latest_file, latest_green = _latest_round_green()
    consume = latest_file is not None and meta.get("refreshed_through") != latest_file
    if consume:
        refresh |= latest_green
        meta["refreshed_through"] = latest_file
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
            # Minting is tied to consuming a NEW round's CORRECTNESS
            # file: an ever-green name missing from the file outside
            # that moment was deliberately deleted to force
            # re-verification (docstring), and re-adding it would
            # certify source the driver never saw.
            if consume and name in latest_green:
                recorded[name] = fp
                added.append(name)
        elif name in refresh and recorded[name] != fp:
            recorded[name] = fp
            refreshed.append(name)
    out: dict = dict(sorted(recorded.items()))
    out[_META_KEY] = meta
    with open(STAMPS_PATH, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(f"recorded {len(added)} new, refreshed {len(refreshed)}; "
          f"total {len(recorded)} stamps in {STAMPS_PATH}")
    if added:
        print("new:", ", ".join(added))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
