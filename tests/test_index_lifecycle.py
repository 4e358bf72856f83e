"""Direct unit tests for the shared index-lifecycle kernel
(ringo_spark/index_lifecycle.py, VERDICT r14 item 3).

The end-to-end crash-injection tests (tests/test_deletion.py,
tests/test_streaming.py, tests/test_engine.py) drive these primitives
through Spark; these tests pin the kernel's own state machine corner
cases on a bare filesystem so a future edit can't silently change a
recovery decision."""

import os

import pytest

from ringo_spark import index_lifecycle as ilc


def _mkdir(p, *files):
    os.makedirs(p)
    for f in files:
        open(os.path.join(p, f), "w").close()


def test_swap_paths_naming_is_stable(tmp_path):
    live = str(tmp_path / "idx")
    tmp, old = ilc.swap_paths(live + "/")      # trailing slash tolerated
    assert tmp == live + "__compact"
    assert old == live + "__old"


def test_recover_live_prefers_old_over_compact(tmp_path):
    """Between the two publish renames the original sits in __old and a
    complete rewrite in __compact — recovery must restore the ORIGINAL
    (any tombstone log rides inside it; the redo re-applies)."""
    live = str(tmp_path / "idx")
    tmp, old = ilc.swap_paths(live)
    _mkdir(old, "original")
    _mkdir(tmp, "rewrite")
    ilc.recover_live(live)
    assert os.path.exists(os.path.join(live, "original"))
    assert os.path.isdir(tmp)                  # leftovers untouched here


def test_recover_live_promotes_compact_when_old_is_gone(tmp_path):
    live = str(tmp_path / "idx")
    tmp, _old = ilc.swap_paths(live)
    _mkdir(tmp, "rewrite", "_SUCCESS")
    ilc.recover_live(live)
    assert os.path.exists(os.path.join(live, "rewrite"))


def test_recover_live_refuses_incomplete_compact(tmp_path):
    """ADVICE r15: a __compact sibling without its _SUCCESS is a PARTIAL
    rewrite — promoting it would silently accept data loss as the live
    index.  Recovery must fail loud instead."""
    live = str(tmp_path / "idx")
    tmp, _old = ilc.swap_paths(live)
    _mkdir(tmp, "partial_rewrite")             # no _SUCCESS
    with pytest.raises(FileNotFoundError, match="INCOMPLETE"):
        ilc.recover_live(live)
    assert not os.path.exists(live)            # nothing promoted
    assert os.path.isdir(tmp)                  # evidence preserved


def test_recover_live_require_raises_with_no_copy(tmp_path):
    live = str(tmp_path / "idx")
    with pytest.raises(FileNotFoundError):
        ilc.recover_live(live, require=True)
    ilc.recover_live(live)                     # tolerant default: no-op


def test_clear_then_publish_roundtrip(tmp_path):
    live = str(tmp_path / "idx")
    tmp, old = ilc.swap_paths(live)
    _mkdir(live, "v1")
    _mkdir(tmp, "stale_rewrite")
    _mkdir(old, "stale_old")
    ilc.clear_swap_leftovers(live)
    assert not os.path.isdir(tmp) and not os.path.isdir(old)
    _mkdir(tmp, "v2")
    ilc.publish_swap(live)
    assert os.path.exists(os.path.join(live, "v2"))
    assert not os.path.isdir(tmp) and not os.path.isdir(old)


def test_serve_cached_gate_and_finish_build(tmp_path):
    root = str(tmp_path / "root")
    idx = os.path.join(root, "k4-abc")
    os.makedirs(idx)
    assert not ilc.serve_cached(idx, "_OK")        # no marker yet
    ilc.finish_build(idx, root, marker="_OK")
    assert os.path.exists(os.path.join(idx, "_OK"))
    assert ilc.serve_cached(idx, "_OK")            # hit
    assert not ilc.serve_cached(idx, "_OK", force=True)   # force rebuilds


def test_pointer_flip_is_total(tmp_path):
    ptr = str(tmp_path / "_LATEST")
    assert ilc.read_pointer(ptr) is None
    ilc.flip_pointer(ptr, "v0")
    assert ilc.read_pointer(ptr) == "v0"
    ilc.flip_pointer(ptr, "v1")
    assert ilc.read_pointer(ptr) == "v1"
    assert not os.path.exists(ptr + ".tmp")


def test_recover_staging_discards_incomplete(tmp_path):
    stage = str(tmp_path / "_staging")
    _mkdir(stage, "_SUCCESS")                  # marker missing
    calls = []
    ilc.recover_staging(stage, "_up_to", lambda: calls.append(1))
    assert not os.path.isdir(stage) and not calls


def test_recover_staging_finishes_complete(tmp_path):
    stage = str(tmp_path / "_staging")
    _mkdir(stage, "_SUCCESS", "_up_to")
    calls = []
    ilc.recover_staging(stage, "_up_to", lambda: calls.append(1))
    assert calls == [1] and os.path.isdir(stage)   # finish owns cleanup


def test_index_tag_matches_r14_format(tmp_path):
    """Tags must stay byte-identical to the r14 per-module md5[:10]
    scheme or every cached index on every machine silently misses."""
    import hashlib

    spec = "/data/sf0.1|16|deadbeef01|c"
    assert ilc.index_tag(spec) == hashlib.md5(
        spec.encode()).hexdigest()[:10]


def test_kernel_adoption_no_module_local_swaps():
    """VERDICT r15 item 8: the lifecycle kernel owns every persisted
    index/sink root's swap and marker mechanics — this is the
    refactor's structural regression guard.  Asserts (a) every module
    that persists an artifact root imports the kernel, and (b) no
    os.rename/os.replace/shutil.move call exists in operators/ or
    streaming/ outside the single whitelisted site (vocab.py's
    compaction lands its staged dir inside a kernel
    recover_staging-orchestrated _finish — the rename IS the kernel
    pattern's publish step, recovery included).  The Engine's table
    storage protocols (engine.py) are a separate, crash-tested surface
    and stay out of scope."""
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "ringo_spark")

    persisting = ["operators/dedup.py", "operators/similarity.py",
                  "operators/text.py", "operators/deletion.py",
                  "streaming/vocab.py", "streaming/sampling.py",
                  "streaming/ann.py"]
    for rel in persisting:
        text = open(os.path.join(pkg, rel)).read()
        assert "index_lifecycle" in text, f"{rel} no longer uses the kernel"

    whitelist = {("streaming/vocab.py", 1)}   # see docstring
    offenders = []
    for sub in ("operators", "streaming"):
        d = os.path.join(pkg, sub)
        for fn in sorted(os.listdir(d)):
            if not fn.endswith(".py"):
                continue
            rel = f"{sub}/{fn}"
            text = open(os.path.join(d, fn)).read()
            n = len(re.findall(r"\bos\.rename\(|\bos\.replace\(|"
                               r"\bshutil\.move\(", text))
            if n and (rel, n) not in whitelist:
                offenders.append((rel, n))
    assert not offenders, (
        "module-local rename/swap calls outside the kernel (route them "
        f"through ringo_spark/index_lifecycle.py): {offenders}")


def test_admit_commit_without_intent_raises(tmp_path):
    """ADVICE r17: the defensive intent-less commit minted an EMPTY-note
    done file, which note readers (streaming _next_stamp) treat as
    unknown — a replay of that batch then allocated a SECOND stamp and
    wrote a second sink partition.  A commit with neither intent nor an
    existing done is now a loud protocol violation; a re-commit after
    the done landed stays a note-preserving no-op."""
    root = str(tmp_path / "idx")
    with pytest.raises(RuntimeError, match="admit_intent"):
        ilc.admit_commit(root, "deadbeef")
    assert ilc.admit_state(root, "deadbeef") == "new"   # nothing minted
    ilc.admit_intent(root, "deadbeef", "7")
    ilc.admit_commit(root, "deadbeef")
    assert ilc.admit_state(root, "deadbeef") == "done"
    assert ilc.admit_note(root, "deadbeef") == "7"
    # re-commit (idempotent caller / raced rename): no-op, note intact
    ilc.admit_commit(root, "deadbeef")
    assert ilc.admit_note(root, "deadbeef") == "7"


def test_archive_admissions_resets_ledger_with_monotone_floor(tmp_path):
    """ADVICE r17: a force rebuild overwrites the stored corpus but used
    to leave the admission ledger intact — replays of previously
    admitted batches were refused as 'done' against data that no longer
    existed.  serve_cached(force=True) now archives the ledger: the
    batch reads as NEW again, the archive keeps the audit trail, and
    the seeded __floor keeps post-rebuild stamps monotone."""
    root = str(tmp_path / "idx")
    os.makedirs(root)
    ilc.admit_intent(root, "aaaa", "0")
    ilc.admit_commit(root, "aaaa")
    ilc.admit_intent(root, "bbbb", "1")
    ilc.admit_commit(root, "bbbb")
    open(os.path.join(root, "_OK"), "w").close()
    assert ilc.serve_cached(root, "_OK") is True       # cache hit first
    assert ilc.serve_cached(root, "_OK", force=True) is False
    assert ilc.admit_state(root, "aaaa") == "new"      # replay re-runs
    arch = os.path.join(root, ilc.ADMITTED + ".rebuilt.1")
    assert os.path.isdir(arch)
    assert open(os.path.join(arch, "bbbb")).read() == "1"   # audit trail
    # the fresh ledger's floor carries the old top stamp
    assert open(os.path.join(root, ilc.ADMITTED, "__floor")).read() == "1"
    # a second force rebuild archives again, floor carried forward
    ilc.admit_intent(root, "cccc", "5")
    ilc.admit_commit(root, "cccc")
    assert ilc.serve_cached(root, "_OK", force=True) is False
    assert os.path.isdir(os.path.join(root, ilc.ADMITTED + ".rebuilt.2"))
    assert open(os.path.join(root, ilc.ADMITTED, "__floor")).read() == "5"
    # no ledger at all: archive is a no-op
    ilc.archive_admissions(str(tmp_path / "nothing"))


def test_archive_admissions_refuses_while_admission_in_flight(tmp_path):
    """ADVICE r18: serve_cached(force=True) archived the ledger without
    honoring the admits_in_flight guard every other destructive sidecar
    maintenance uses — an in-flight admission's intent moved aside, so
    its admit_commit raised the misleading intent-less error and the
    batch's work was recorded nowhere.  The force path now refuses
    until the admission commits (or a crashed batch's retry heals it)."""
    root = str(tmp_path / "idx")
    os.makedirs(root)
    open(os.path.join(root, "_OK"), "w").close()
    ilc.admit_intent(root, "aaaa", "0")        # in flight: intent, no done
    with pytest.raises(RuntimeError, match="in flight"):
        ilc.serve_cached(root, "_OK", force=True)
    # the ledger is untouched — the writer's commit still succeeds
    ilc.admit_commit(root, "aaaa")
    assert ilc.admit_state(root, "aaaa") == "done"
    # with nothing in flight the force rebuild archives as before
    assert ilc.serve_cached(root, "_OK", force=True) is False
    assert os.path.isdir(os.path.join(root, ilc.ADMITTED + ".rebuilt.1"))
