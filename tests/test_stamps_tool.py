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
