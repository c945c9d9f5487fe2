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
   SYMBOL in the query's transitive dependency closure changed after
   the round that earned the row — a green row proves nothing about
   code it never ran. Ranked oldest-row-first within the class;
3. queries whose latest row is oldest (fixture regens make old rows
   stale: a row earned on generation-N files proves nothing about
   generation-N+1);
4. within a staleness class, REGISTRATION order (module-merge
   definition order, NOT the GRADING_PRIORITY reordering — so
   committing a new window never changes the planner's own ranking,
   r10 advisory #3).

A round-N row is diffed against the ``round N: verdict/...`` marker
commit the driver writes — the tree the row was actually earned on.
Staleness is FUNCTION-LEVEL since round 11 (r10 verdict item #3):
:mod:`tools.symbols` hashes every top-level def/class/assignment and
diffs changed SYMBOLS, so appending a new operator to a 2,000-line
query module no longer stales every sibling query's row — only a
change inside a symbol a query actually (transitively) references
does. The module-granular import graph
(:func:`tools.selfcheck.affected_queries`) remains the SPLICE
admissibility check — deliberately coarser, in the conservative
direction. Registration hubs (registry/rotation/``queries/__init__``)
are name-wiring, not data dependencies, and are excluded from both
analyses by design.

Re-derivability (r10 advisory #3): ``--base <commit>`` diffs each
round marker against THAT commit's tree instead of the working tree,
so a window derived at a freeze commit can be reproduced verbatim
later (the committed GRADING_PRIORITY records the freeze SHA). The
graded-rounds input is the CORRECTNESS_r*.json set present on disk;
re-derivation after the next round's file lands must ignore it.

Changed-this-round queries cannot be detected by staleness (their last
row predates the change by definition, but so does every IOU's) — the
builder lists them in ``registry.FRONTED`` and the planner pins those
names to the head of the window, in FRONTED order, ahead of its own
ranking (r14 ADVICE #3: with the fronting convention INSIDE the
planner's input, the committed GRADING_PRIORITY is planner output
verbatim and a later regeneration cannot silently drop it).
Never-graded queries need no FRONTED entry — they already rank first
as class 0. Paste the printed tuple into ``registry.GRADING_PRIORITY``
and re-run ``tests/test_differential.py::test_grading_window_rotation``.
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


def _round_markers(repo_root: str) -> dict[int, str] | None:
    """round number -> ``round N: verdict`` marker commit sha (latest
    marker per round), or ``None`` when git/markers are unavailable."""
    try:
        log = subprocess.run(
            ["git", "-C", repo_root, "log", "--format=%H %s"],
            check=True, capture_output=True, text=True,
        ).stdout
    except (OSError, subprocess.CalledProcessError):
        return None
    markers: dict[int, str] = {}
    for line in log.splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+): verdict", subject)
        if m:  # newest first — keep the first (latest) marker per round
            markers.setdefault(int(m.group(1)), sha)
    return markers or None


def _tree_files(repo_root: str, ref: str | None) -> dict[str, str] | None:
    """``{repo-relative path: source}`` for every package .py file at
    ``ref`` (a commit), or in the working tree when ``ref`` is None."""
    pkg = "tfm_taxitrips_spark"
    if ref is None:
        out: dict[str, str] = {}
        for root, _dirs, files in os.walk(os.path.join(repo_root, pkg)):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    with open(p) as fh:
                        out[os.path.relpath(p, repo_root)] = fh.read()
        return out
    def git(*args: str) -> str:
        return subprocess.run(
            ["git", "-C", repo_root, *args],
            check=True, capture_output=True, text=True,
        ).stdout
    try:
        paths = [p for p in git("ls-tree", "-r", "--name-only", ref,
                                "--", pkg).splitlines()
                 if p.endswith(".py")]
        return {p: git("show", f"{ref}:{p}") for p in paths}
    except (OSError, subprocess.CalledProcessError):
        return None


def _tree_blob_map(repo_root: str, ref: str) -> dict[str, str] | None:
    """``{repo-relative .py path: blob sha}`` for the package at ``ref``
    (one ``git ls-tree`` subprocess), or ``None`` on git failure."""
    try:
        ls = subprocess.run(
            ["git", "-C", repo_root, "ls-tree", "-r", ref, "--",
             "tfm_taxitrips_spark"],
            check=True, capture_output=True, text=True,
        ).stdout
    except (OSError, subprocess.CalledProcessError):
        return None
    out: dict[str, str] = {}
    for line in ls.splitlines():
        meta, _, path = line.partition("\t")
        parts = meta.split()
        if path.endswith(".py") and len(parts) >= 3 and parts[1] == "blob":
            out[path] = parts[2]
    return out


def _cat_file_batch(repo_root: str, shas: list[str]) -> dict[str, str] | None:
    """blob sha -> decoded content for every sha, via ONE
    ``git cat-file --batch`` process (r11 advisory: one ``git show`` per
    file per marker was ~files × rounds subprocess spawns)."""
    if not shas:
        return {}
    try:
        res = subprocess.run(
            ["git", "-C", repo_root, "cat-file", "--batch"],
            input=("\n".join(shas) + "\n").encode(),
            check=True, capture_output=True,
        )
    except (OSError, subprocess.CalledProcessError):
        return None
    out: dict[str, str] = {}
    buf, pos = res.stdout, 0
    for sha in shas:
        nl = buf.find(b"\n", pos)
        if nl < 0:
            return None
        parts = buf[pos:nl].decode().split()
        if len(parts) != 3 or parts[1] != "blob":
            return None
        size = int(parts[2])
        start = nl + 1
        out[sha] = buf[start:start + size].decode()
        pos = start + size + 1  # object is newline-terminated
    return out


def symbols_changed_since_round(
    repo_root: str, base: str | None = None
) -> dict[int, set[tuple[str, str]]] | None:
    """round number -> SYMBOLS (tools.symbols ids) changed between that
    round's marker tree and the reference tree (working tree, or
    ``base`` when given — the re-derivability pin). ``None`` when
    git/markers are unavailable.

    Batched (r11 advisory): marker trees are listed with one
    ``ls-tree`` each, every UNIQUE blob is fetched once through a
    single ``cat-file --batch`` process, and each unique (path, blob)
    is parsed into its symbol table exactly once — most files are
    identical across markers, so the cost is ~|distinct blobs|, not
    ~|files| × |rounds| subprocess spawns + re-parses."""
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    from tools.symbols import (
        HUB_FILES,
        changed_symbols_from_tables,
        symbol_table,
    )

    markers = _round_markers(repo_root)
    if markers is None:
        return None
    new_files = _tree_files(repo_root, base)
    if new_files is None:
        return None

    def tracked(p: str) -> bool:
        return p.endswith(".py") and p not in HUB_FILES

    new_tables = {p: symbol_table(p, src) for p, src in new_files.items()
                  if tracked(p)}

    blob_maps: dict[int, dict[str, str]] = {}
    for rnd, sha in markers.items():
        bm = _tree_blob_map(repo_root, sha)
        if bm is None:
            return None
        blob_maps[rnd] = {p: b for p, b in bm.items() if tracked(p)}
    unique = sorted({b for bm in blob_maps.values() for b in bm.values()})
    contents = _cat_file_batch(repo_root, unique)
    if contents is None:
        return None

    memo: dict[tuple[str, str], dict[str, str] | None] = {}
    out: dict[int, set[tuple[str, str]]] = {}
    for rnd, bm in blob_maps.items():
        old_tables: dict[str, dict[str, str] | None] = {}
        for p, bsha in bm.items():
            key = (p, bsha)
            if key not in memo:
                memo[key] = symbol_table(p, contents[bsha])
            old_tables[p] = memo[key]
        out[rnd] = changed_symbols_from_tables(old_tables, new_tables)
    return out


def query_symbol_closures(
    repo_root: str, base: str | None = None
) -> dict[str, set[tuple[str, str]]]:
    """query name -> transitive SYMBOL closure (tools.symbols), rooted
    at the query's ``QUERIES[<name>]`` registration entry. The
    name→module mapping comes from the live registry (module files are
    append-stable across a round)."""
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    from tools.symbols import query_symbol_closures as _qsc

    from tfm_taxitrips_spark.queries.registry import all_queries

    files = _tree_files(repo_root, base)
    modules = {
        name: spec.fn.__module__.replace(".", os.sep) + ".py"
        for name, spec in all_queries().items()
    }
    return _qsc(files, modules)


def plan(window: int = 50, repo_root: str | None = None,
         base: str | None = None) -> list[tuple[str, int, bool]]:
    """Return [(name, latest_round, code_stale)] for the recommended
    window: ``registry.FRONTED`` names first (in FRONTED order — the
    round's changed queries, r14 ADVICE #3), then never-graded
    (latest_round 0), then code-stale rows (oldest round first), then
    clean rows by round age. Staleness is symbol-level
    (``tools.symbols``); falls back to the module-level import graph
    when git markers are unavailable, and to round-age only when even
    that fails."""
    from tfm_taxitrips_spark.queries.registry import (
        FRONTED,
        registration_order,
    )

    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    latest = latest_graded_round(repo_root)

    from tools.symbols import intersects

    changed_syms = symbols_changed_since_round(repo_root, base)
    if changed_syms is not None:
        closures = query_symbol_closures(repo_root, base)

        def stale(n: str) -> bool:
            rnd = latest.get(n, 0)
            if rnd == 0:
                return False
            return intersects(closures.get(n, set()),
                              changed_syms.get(rnd, set()))
    else:  # pre-r11 module-granular fallback
        changed = files_changed_since_round(repo_root)
        fclosures = query_closures(repo_root) if changed is not None else {}

        def stale(n: str) -> bool:
            rnd = latest.get(n, 0)
            if rnd == 0 or changed is None:
                return False
            return bool(fclosures.get(n, set()) & changed.get(rnd, set()))

    # REGISTRATION order (not the current GRADING_PRIORITY reordering):
    # rewriting the window must not perturb the planner's own tiebreak
    names = list(registration_order())
    idx = {n: i for i, n in enumerate(names)}

    def key(n: str):
        rnd = latest.get(n, 0)
        cls = 0 if rnd == 0 else (1 if stale(n) else 2)
        return (cls, rnd, idx[n])

    ranked = sorted(names, key=key)
    fronted = [n for n in FRONTED if n in idx]
    fset = set(fronted)
    ordered = fronted + [n for n in ranked if n not in fset]
    return [(n, latest.get(n, 0), stale(n)) for n in ordered[:window]]


def main() -> None:
    args = list(sys.argv[1:])
    base: str | None = None
    if "--base" in args:
        i = args.index("--base")
        try:
            base = args[i + 1]
        except IndexError:
            sys.exit("--base requires a commit-ish")
        del args[i:i + 2]
    window = int(args[0]) if args else 50
    rows = plan(window, base=base)
    from tfm_taxitrips_spark.queries.registry import FRONTED

    never = sum(1 for _, r, _s in rows if r == 0)
    n_stale = sum(1 for _, _r, s in rows if s)
    # count the names actually fronted, not len(FRONTED): plan() drops
    # unregistered names, and the header must describe the tuple below
    n_front = sum(1 for n, _r, _s in rows if n in FRONTED)
    at = f" at --base {base}" if base else ""
    print(f"# recommended next GRADING_PRIORITY ({len(rows)} slots{at}; "
          f"{n_front} FRONTED, then {never} never-graded, "
          f"then {n_stale} code-stale)")
    print("GRADING_PRIORITY: tuple[str, ...] = (")
    for name, rnd, st in rows:
        tag = ("never graded" if rnd == 0
               else f"latest row: r{rnd}" + (", code changed since" if st
                                             else ""))
        if name in FRONTED:
            tag = f"FRONTED (changed this round); {tag}"
        print(f'    "{name}",  # {tag}')
    print(")")


if __name__ == "__main__":
    main()
