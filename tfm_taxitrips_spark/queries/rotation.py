"""Grading-window rotation planner.

Run: ``python -m tfm_taxitrips_spark.queries.rotation [window_size]``

The grading driver re-verifies only the FIRST ``window_size`` (50)
registry entries per round, so with 200+ registered queries the window
must rotate. This tool derives the recommended next window from the
repo's own artifacts — the ``CORRECTNESS_r*.json`` files (the same
ground truth the rotation invariant test uses), the git round-marker
commits, and the selfcheck tool's import-closure analysis — ordered by
staleness:

1. queries with NO driver row in any round (hard debt: the rotation test
   fails unless they sit in the window or carry a PENDING_ROTATION IOU);
2. queries whose latest row is CODE-STALE (r9 verdict item #3): some
   file in the query's transitive import closure changed after the
   round that earned the row — a green row proves nothing about code it
   never ran. Ranked oldest-row-first within the class;
3. queries whose latest row is oldest (fixture regens make old rows
   stale: a row earned on generation-N files proves nothing about
   generation-N+1);
4. within a staleness class, registry (module) order.

A round-N row is diffed against the ``round N: verdict/...`` marker
commit the driver writes — the tree the row was actually earned on.
Closures come from :func:`tools.selfcheck.affected_queries`'s import
graph (the ``__meta__.file_hashes`` machinery), so the planner and the
splice-admissibility check can never disagree about what a file change
reaches. Registration hubs (registry/rotation/``queries/__init__``) are
name-wiring, not data dependencies, and are excluded there by design.

The output is advisory: new/changed-this-round queries must be fronted
manually (the tool cannot know what changed semantics), displacing the
tail. Paste the printed tuple into ``registry.GRADING_PRIORITY`` and
re-run ``tests/test_differential.py::test_grading_window_rotation``.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys


def latest_graded_round(repo_root: str) -> dict[str, int]:
    """query name -> latest round with a CORRECTNESS row (absent = never)."""
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            for name in json.load(fh):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def files_changed_since_round(repo_root: str) -> dict[int, set[str]] | None:
    """round number -> package files changed between that round's marker
    commit (``round N: verdict/...`` — the tree the driver graded) and
    the working tree. ``None`` when git/markers are unavailable (the
    planner then falls back to round-age-only ranking)."""
    def git(*args: str) -> str:
        return subprocess.run(
            ["git", "-C", repo_root, *args],
            check=True, capture_output=True, text=True,
        ).stdout

    try:
        log = git("log", "--format=%H %s")
    except (OSError, subprocess.CalledProcessError):
        return None
    markers: dict[int, str] = {}
    for line in log.splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+): verdict", subject)
        if m:  # newest first — keep the first (latest) marker per round
            markers.setdefault(int(m.group(1)), sha)
    if not markers:
        return None
    # registration hubs are name-wiring (window rotation edits them every
    # round without touching any query's semantics) — excluded from the
    # staleness diff for the same reason the selfcheck import graph drops
    # their edges; a hub change that DID alter semantics is covered by
    # the standing full-sweep rule, not by rotation.
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    from tools.selfcheck import _REGISTRATION_HUBS

    out: dict[int, set[str]] = {}
    for rnd, sha in markers.items():
        try:
            # diff INCLUDES uncommitted working-tree changes on purpose:
            # mid-round edits already invalidate the old rows
            diff = git("diff", "--name-only", sha, "--",
                       "tfm_taxitrips_spark")
        except subprocess.CalledProcessError:
            return None
        out[rnd] = {p for p in diff.splitlines()
                    if p and p not in _REGISTRATION_HUBS}
    return out


def query_closures(repo_root: str) -> dict[str, set[str]]:
    """query name -> transitive import-closure files, via the selfcheck
    tool's graph (ONE shared analysis with the splice-admissibility
    check)."""
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    from tools.selfcheck import _import_graph

    from tfm_taxitrips_spark.queries.registry import all_queries

    graph = _import_graph(repo_root)
    memo: dict[str, set[str]] = {}

    def closure(start: str) -> set[str]:
        if start not in memo:
            seen = {start}
            stack = [start]
            while stack:
                for d in graph.get(stack.pop(), ()):
                    if d not in seen:
                        seen.add(d)
                        stack.append(d)
            memo[start] = seen
        return memo[start]

    return {
        name: closure(spec.fn.__module__.replace(".", os.sep) + ".py")
        for name, spec in all_queries().items()
    }


def plan(window: int = 50, repo_root: str | None = None) -> list[tuple[str, int, bool]]:
    """Return [(name, latest_round, code_stale)] for the recommended
    window: never-graded first (latest_round 0), then code-stale rows
    (oldest round first), then clean rows by round age."""
    from tfm_taxitrips_spark.queries.registry import all_queries

    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    latest = latest_graded_round(repo_root)
    changed = files_changed_since_round(repo_root)
    closures = query_closures(repo_root) if changed is not None else {}
    names = list(all_queries())  # registry order = tiebreaker
    idx = {n: i for i, n in enumerate(names)}

    def stale(n: str) -> bool:
        rnd = latest.get(n, 0)
        if rnd == 0 or changed is None:
            return False
        return bool(closures.get(n, set()) & changed.get(rnd, set()))

    def key(n: str):
        rnd = latest.get(n, 0)
        cls = 0 if rnd == 0 else (1 if stale(n) else 2)
        return (cls, rnd, idx[n])

    ranked = sorted(names, key=key)
    return [(n, latest.get(n, 0), stale(n)) for n in ranked[:window]]


def main() -> None:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    rows = plan(window)
    never = sum(1 for _, r, _s in rows if r == 0)
    n_stale = sum(1 for _, _r, s in rows if s)
    print(f"# recommended next GRADING_PRIORITY ({len(rows)} slots; "
          f"{never} never-graded first, then {n_stale} code-stale; "
          f"front new/changed queries manually)")
    print("GRADING_PRIORITY: tuple[str, ...] = (")
    for name, rnd, st in rows:
        tag = ("never graded" if rnd == 0
               else f"latest row: r{rnd}" + (", code changed since" if st
                                             else ""))
        print(f'    "{name}",  # {tag}')
    print(")")


if __name__ == "__main__":
    main()
