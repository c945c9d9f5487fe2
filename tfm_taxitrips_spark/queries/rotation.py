"""Grading-window rotation planner.

Run: ``python -m tfm_taxitrips_spark.queries.rotation [window_size]``

The grading driver re-verifies only the FIRST ``window_size`` (50)
registry entries per round, so with 140 registered queries the window
must rotate. This tool derives the recommended next window from the
``CORRECTNESS_r*.json`` files themselves — the same ground truth the
rotation invariant test uses — ordered by staleness:

1. queries with NO driver row in any round (hard debt: the rotation test
   fails unless they sit in the window or carry a PENDING_ROTATION IOU);
2. queries whose latest row is oldest (fixture regens make old rows
   stale: a row earned on generation-N files proves nothing about
   generation-N+1);
3. within a staleness class, registry (module) order.

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


def plan(window: int = 50, repo_root: str | None = None) -> list[tuple[str, int]]:
    """Return [(name, latest_round)] for the recommended window, stalest
    first (latest_round 0 = never graded)."""
    from tfm_taxitrips_spark.queries.registry import all_queries

    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    latest = latest_graded_round(repo_root)
    names = list(all_queries())  # registry order = tiebreaker
    idx = {n: i for i, n in enumerate(names)}
    ranked = sorted(names, key=lambda n: (latest.get(n, 0), idx[n]))
    return [(n, latest.get(n, 0)) for n in ranked[:window]]


def main() -> None:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    rows = plan(window)
    never = sum(1 for _, r in rows if r == 0)
    print(f"# recommended next GRADING_PRIORITY ({len(rows)} slots; "
          f"{never} never-graded first; front new/changed queries manually)")
    print("GRADING_PRIORITY: tuple[str, ...] = (")
    for name, rnd in rows:
        tag = "never graded" if rnd == 0 else f"latest row: r{rnd}"
        print(f'    "{name}",  # {tag}')
    print(")")


if __name__ == "__main__":
    main()
