"""Driver-window invariants (ADVICE r2 #1, VERDICT r3 #2).

The grading driver hash-checks only the FIRST 50 entries of ``queries()``.
These tests make the rotation policy mechanical instead of conventional:

1. the explicit ``_PRIORITY`` tuple IS the first-50 window, exactly;
2. every registered query that has never earned a green driver row (per the
   committed CORRECTNESS_r*.json scoreboard files) must sit inside the
   window — a query added this round can therefore never silently land at
   position 51+ the way agg_mode/text_vocab_topk did in round 2;
3. every query whose implementing code changed since its LAST green round
   must sit inside the window — the rule that round 2 broke three times
   (join_broadcast / unpivot_measures / scalar_datetime went stale for two
   rounds because this check was manual convention). "Implementing code"
   is the query's module plus its transitive intra-package imports (so a
   ``functions/numeric.py`` rewrite stales every money aggregate, and an
   ``operators/similarity.py`` change stales the persisted-index probe
   that imports its math); change detection is ``git diff`` against the
   commit that recorded the round's CORRECTNESS file. ``session.py`` /
   ``registry.py`` are excluded as load-only plumbing: every in-window
   query exercises them every round, so a breakage there fails 50 hard
   rows rather than hiding in an unwindowed one.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess

from broadway_kinesis_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50

_PLUMBING = {
    "broadway_kinesis_spark/session.py",
    "broadway_kinesis_spark/registry.py",
}


def _green_rounds() -> dict[str, list[int]]:
    out: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json", path).group(1))
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                out.setdefault(name, []).append(rnd)
    return out


def _ever_green() -> set[str]:
    return set(_green_rounds())


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


_IMPORT_RE = re.compile(
    r"^\s*(?:from|import)\s+(broadway_kinesis_spark(?:\.\w+)*)", re.MULTILINE
)


def _dep_closure(mod: str) -> set[str]:
    """Repo-relative files whose change alters this module's behavior: the
    module itself plus transitive intra-package imports (minus plumbing)."""
    seen: set[str] = set()
    stack = [mod.replace(".", "/") + ".py"]
    while stack:
        rel = stack.pop()
        if rel in seen or rel in _PLUMBING:
            continue
        path = os.path.join(REPO, rel)
        if not os.path.isfile(path):
            continue
        seen.add(rel)
        with open(path) as f:
            src = f.read()
        for m in _IMPORT_RE.finditer(src):
            stack.append(m.group(1).replace(".", "/") + ".py")
    return seen


def _recording_commit(rnd: int) -> str:
    out = _git(
        "log", "--reverse", "--format=%H", "--diff-filter=A", "--",
        f"CORRECTNESS_r{rnd:02d}.json",
    ).strip()
    if not out:
        # The driver drops CORRECTNESS_r{N}.json into the worktree mid-cycle,
        # BEFORE the builder's next session commits it (VERDICT r4 #1: the
        # suite must never go red solely because of that uncommitted file).
        # Fold it in with HEAD as the recording point — but ONLY for a file
        # that is genuinely UNTRACKED (the mid-cycle drop). A TRACKED file
        # with no add-commit means rewritten/lost history and must still
        # fail loudly: silently substituting HEAD there would diff against
        # the wrong point and let stale rows pass as current (code-review
        # finding). Sound under the round protocol (commit the artifact
        # FIRST, before any operator edit): at the drop moment HEAD is
        # exactly the freeze commit the driver measured.
        tracked = subprocess.run(
            ["git", "ls-files", "--error-unmatch", f"CORRECTNESS_r{rnd:02d}.json"],
            cwd=REPO, capture_output=True, text=True,
        ).returncode == 0
        assert not tracked, (
            f"CORRECTNESS_r{rnd:02d}.json is tracked but no commit adds it "
            "(rewritten history?) — refusing to guess a recording point"
        )
        return _git("rev-parse", "HEAD").strip()
    return out.splitlines()[0]


def _required() -> set[str]:
    """Queries that demand a window slot: never-green ones plus every query
    whose implementing code changed since its last green round."""
    greens = _green_rounds()
    changed_since: dict[int, set[str]] = {}
    for rnd in {max(rs) for rs in greens.values()}:
        commit = _recording_commit(rnd)
        changed_since[rnd] = {
            line.strip()
            for line in _git("diff", "--name-only", commit, "--", ".").splitlines()
            if line.strip()
        }
    registry.queries()  # force lazy module registration before iterating
    req = set()
    for name, q in registry.REGISTRY.items():
        rounds = greens.get(name)
        if not rounds:
            req.add(name)  # never green
            continue
        deps = _dep_closure(q.fn.__module__)
        if deps & changed_since[max(rounds)]:
            req.add(name)  # stale
    return req


def test_every_stale_query_is_inside_the_window_or_explicitly_deferred():
    """changed-since-last-green => in-window, mechanically (VERDICT r3 #2).

    When more queries are required than the window holds (>50), the
    overflow must be EXPLICIT: exactly the ``registry._DEFERRED`` tuple,
    legal only while every window slot is itself required (no deferral
    while discretionary filler occupies a slot), and only for queries
    that do have a green row for some earlier form (a never-green query
    must never be deferred — its row would never exist at all)."""
    required = _required()
    prio = set(registry._PRIORITY)
    deferred = set(registry._DEFERRED)
    outside = required - prio
    assert outside == deferred, (
        "required-but-outside-window queries must exactly match the "
        f"documented _DEFERRED set; silent overflow: {sorted(outside - deferred)}; "
        f"stale _DEFERRED entries no longer required: {sorted(deferred - outside)}"
    )
    if deferred:
        filler = prio - required
        assert not filler, (
            "cannot defer required queries while discretionary filler holds "
            f"window slots: {sorted(filler)}"
        )
        greens = _green_rounds()
        never_green_deferred = deferred - set(greens)
        assert not never_green_deferred, (
            f"never-green queries may not be deferred: {sorted(never_green_deferred)}"
        )


def test_priority_is_exactly_the_window():
    assert len(registry._PRIORITY) == WINDOW
    assert len(set(registry._PRIORITY)) == WINDOW, "duplicate names in _PRIORITY"
    first = list(registry.queries())[:WINDOW]
    assert first == list(registry._PRIORITY)


def test_every_never_verified_query_is_inside_the_window():
    registered = set(registry.queries())
    green = _ever_green()
    never_checked = registered - green
    outside = never_checked - set(registry._PRIORITY)
    assert not outside, (
        f"queries with no green driver row ever are outside the first-{WINDOW} "
        f"window and would never be hash-checked: {sorted(outside)}"
    )


def test_priority_names_all_registered():
    registered = set(registry.queries())
    missing = [n for n in registry._PRIORITY if n not in registered]
    assert not missing


def test_window_invariants_survive_an_uncommitted_driver_artifact():
    """VERDICT r4 #1/#2 end-to-end: when the driver drops a NEW
    CORRECTNESS_r*.json into the worktree (untracked, uncommitted), the
    staleness machinery must fold it in with HEAD as the recording point
    — all-green rows recorded at HEAD are maximally CURRENT, so the
    window demand can only shrink, never explode — and the suite's
    invariants must hold exactly as they did before the drop."""
    import shutil

    src = os.path.join(REPO, "CORRECTNESS_r04.json")
    sim = os.path.join(REPO, "CORRECTNESS_r98.json")
    assert not os.path.exists(sim)
    required_before = _required()
    shutil.copy(src, sim)
    try:
        # the simulated artifact is untracked -> _recording_commit must
        # fall back to HEAD, not assert
        assert _recording_commit(98) == _git("rev-parse", "HEAD").strip()
        required_after = _required()
        # rows green in the simulated round are green AT HEAD -> their
        # queries can only leave the required set, never join it
        assert required_after <= required_before
        # and the window invariant itself still holds
        outside = required_after - set(registry._PRIORITY)
        assert outside == set(registry._DEFERRED)
    finally:
        os.remove(sim)
