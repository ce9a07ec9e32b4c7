"""operators/index_cache.py — the build-then-rename commit protocol
(r14 advice #2/#3): a build must publish atomically (no interleaved
writes into the served path), a crash must leave nothing marked, a
rename loser must adopt the winner's artifact, and the ':absent'
monkeypatch branch must not leak one dir per call."""

import os

import pytest

from open_street_map_data_wrangling_spark.operators import index_cache
from open_street_map_data_wrangling_spark.operators.index_cache import (
    cached,
)


@pytest.fixture
def sf_dir(tmp_path):
    """A fake corpus dir with one real file behind table 't' so the
    content token is computable (non-absent branch)."""
    p = tmp_path / "sf"
    p.mkdir()
    (p / "t.parquet").write_bytes(b"not really parquet, just bytes")
    return str(p)


def _build_counting(calls):
    def build(path):
        calls.append(path)
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "artifact.txt"), "w") as f:
            f.write("v1")

    return build


def test_build_once_then_hit(sf_dir):
    calls = []
    p1 = cached("tst_hit", sf_dir, ("t",), (index_cache,),
                _build_counting(calls))
    p2 = cached("tst_hit", sf_dir, ("t",), (index_cache,),
                _build_counting(calls))
    assert p1 == p2
    assert len(calls) == 1
    # the build ran in a temp dir, not the published path
    assert calls[0] != p1
    assert calls[0].startswith(p1 + ".build.")
    assert open(os.path.join(p1, "artifact.txt")).read() == "v1"
    # marker committed inside the published dir
    assert any(f.startswith("_built_") for f in os.listdir(p1))


def test_crash_mid_build_publishes_nothing(sf_dir):
    def exploding(path):
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "partial.txt"), "w") as f:
            f.write("half")
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        cached("tst_crash", sf_dir, ("t",), (index_cache,), exploding)
    # nothing published, no orphan temp dir left behind
    calls = []
    p = cached("tst_crash", sf_dir, ("t",), (index_cache,),
               _build_counting(calls))
    assert len(calls) == 1  # the crash left no marked artifact
    assert not os.path.exists(os.path.join(p, "partial.txt"))
    parent = os.path.dirname(p)
    leftovers = [d for d in os.listdir(parent)
                 if d.startswith(os.path.basename(p) + ".build.")]
    assert leftovers == []


def test_rename_loser_adopts_winner(sf_dir):
    """Simulate losing the publish race: while our build runs, a
    'concurrent process' publishes a marked artifact at the final
    path.  Our rename must fail quietly and the winner's content
    must be served."""
    token_path = {}

    def racing(path):
        # path is our temp dir; the final path strips '.build.*'
        final = path.split(".build.")[0]
        token = os.path.basename(final).rsplit("_", 1)[-1]
        os.makedirs(final, exist_ok=True)
        with open(os.path.join(final, "artifact.txt"), "w") as f:
            f.write("winner")
        with open(os.path.join(final, f"_built_{token}"), "w"):
            pass
        token_path["final"] = final
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "artifact.txt"), "w") as f:
            f.write("loser")

    p = cached("tst_race", sf_dir, ("t",), (index_cache,), racing)
    assert p == token_path["final"]
    assert open(os.path.join(p, "artifact.txt")).read() == "winner"
    # loser's temp copy cleaned up
    parent = os.path.dirname(p)
    assert [d for d in os.listdir(parent)
            if d.startswith(os.path.basename(p) + ".build.")] == []


def test_stale_unmarked_dir_is_replaced(sf_dir):
    """A pre-r15 crash could leave a marked-less dir AT the final
    path; the next build must swap it out, not serve it."""
    seen = {}

    def plant_then_build(path):
        final = path.split(".build.")[0]
        os.makedirs(final, exist_ok=True)
        with open(os.path.join(final, "stale.txt"), "w") as f:
            f.write("old")  # no marker -> stale
        seen["final"] = final
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "artifact.txt"), "w") as f:
            f.write("fresh")

    p = cached("tst_stale", sf_dir, ("t",), (index_cache,),
               plant_then_build)
    assert p == seen["final"]
    assert open(os.path.join(p, "artifact.txt")).read() == "fresh"
    assert not os.path.exists(os.path.join(p, "stale.txt"))


def test_absent_branch_unique_and_cleanup_registered(
    tmp_path, monkeypatch
):
    registered = []
    monkeypatch.setattr(
        index_cache.atexit, "register",
        lambda fn, *a, **k: registered.append(a[0] if a else None),
    )
    calls = []
    empty = str(tmp_path / "nowhere")
    p1 = cached("tst_abs", empty, ("t",), (index_cache,),
                _build_counting(calls))
    p2 = cached("tst_abs", empty, ("t",), (index_cache,),
                _build_counting(calls))
    assert p1 != p2  # never reused (data invisible to the token)
    assert len(calls) == 2
    assert registered == [p1, p2]  # both queued for atexit cleanup
    for p in (p1, p2):
        import shutil

        shutil.rmtree(p, ignore_errors=True)
