"""QUERIES.md must stay in sync with the registry — a generated doc
that drifts is worse than none."""

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def test_queries_md_matches_registry(tmp_path):
    current = (ROOT / "QUERIES.md").read_text()
    # regenerate into a scratch copy by running the tool with a
    # temporary HOME-side file: the tool writes next to the repo, so
    # instead regenerate for real and compare against git if changed
    out = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "gen_inventory.py")],
        capture_output=True,
        text=True,
        cwd=ROOT,
    )
    assert out.returncode == 0, out.stderr[-500:]
    regenerated = (ROOT / "QUERIES.md").read_text()
    assert regenerated == current, (
        "QUERIES.md is stale — run tools/gen_inventory.py and commit"
    )
