"""tools/update_stamps.py — the stamp ledger must be a pure function
of the CORRECTNESS history (idempotent regeneration), and every stamp
must belong to a name some round actually verified."""

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def _green_names() -> set[str]:
    names: set[str] = set()
    for path in ROOT.glob("CORRECTNESS_r*.json"):
        rows = json.loads(path.read_text())
        for n, rec in rows.items():
            if isinstance(rec, dict) and (
                rec.get("hash_match") is True or rec.get("err") == "no_oracle"
            ):
                names.add(n)
    return names


def test_update_stamps_is_idempotent_and_sound():
    before = (ROOT / "STAMPS.json").read_text()
    try:
        out = subprocess.run(
            [sys.executable, str(ROOT / "tools" / "update_stamps.py")],
            capture_output=True,
            text=True,
            cwd=ROOT,
            timeout=300,
        )
        assert out.returncode == 0, out.stderr[-500:]
        after = (ROOT / "STAMPS.json").read_text()
        assert after == before, (
            "STAMPS.json changed on regeneration — the ledger must be a "
            "pure function of committed CORRECTNESS history"
        )
    finally:
        # a failing assertion must not leave a regenerated ledger in
        # the working tree
        (ROOT / "STAMPS.json").write_text(before)
    stamps = json.loads(after)
    green = _green_names()
    assert stamps, "no stamps recorded"
    assert set(stamps) <= green, (
        "stamps exist for names no round ever verified: "
        f"{sorted(set(stamps) - green)[:5]}"
    )
    # every stamp is a 16-hex fingerprint
    assert all(
        isinstance(v, str) and len(v) == 16 for v in stamps.values()
    )


def test_stamps_cover_every_green_registry_query():
    """Round-open fold enforcement (VERDICT r13 item 1): every registry
    query with a committed green CORRECTNESS row must carry a stamp.
    If a new CORRECTNESS_r*.json lands and `tools/update_stamps.py`
    was not re-run, this fails — the fold can no longer be forgotten.

    Only COMMITTED correctness files count (same rule as the tool),
    so a locally-generated verification file can't fail the suite.
    """
    committed = set(
        subprocess.run(
            ["git", "ls-files", "CORRECTNESS_r*.json"],
            capture_output=True,
            text=True,
            cwd=ROOT,
        ).stdout.split()
    )
    green: set[str] = set()
    for rel in committed:
        rows = json.loads((ROOT / rel).read_text())
        for n, rec in rows.items():
            if isinstance(rec, dict) and (
                rec.get("hash_match") is True or rec.get("err") == "no_oracle"
            ):
                green.add(n)

    sys.path.insert(0, str(ROOT))
    from open_street_map_data_wrangling_spark.plans import load_all_queries

    registry = set(load_all_queries())
    stamps = set(json.loads((ROOT / "STAMPS.json").read_text()))
    missing = sorted((green & registry) - stamps)
    assert not missing, (
        "green registry queries missing from STAMPS.json — run "
        f"`python tools/update_stamps.py`: {missing[:10]}"
    )
