"""Plan LINTER — the scale anti-patterns this repo's VERDICT/plan-lock
discipline polices by hand, automated as a reusable check: feed it any
DataFrame and get back the findings a 100 TB reviewer would write.

The reference has no planner to lint (SQL ships verbatim to MySQL,
web_scheduler.py:896-1026); on Spark the physical plan is the
performance contract, and these are the contract's known breach
patterns:

- ``cartesian``            CartesianProduct — O(n*m), a scale killer
                           unless one side is a bounded artifact.
- ``nested-loop``          BroadcastNestedLoopJoin — legitimate ONLY
                           for the deliberate broadcast-crossJoin of a
                           1-row/k-row aggregate (this repo's totals
                           pattern); anything else is a missing join
                           key.
- ``python-udf``           BatchEvalPython — row-at-a-time Python in
                           the hot path (~100x slower than builtins;
                           ArrowEvalPython is the sanctioned escape
                           hatch and is NOT flagged).
- ``filter-not-pushed``    a Filter sits directly on a parquet scan
                           whose PushedFilters is empty — the
                           predicate evaluates post-scan (casts or
                           UDFs in the predicate usually caused it).
- ``wide-scan``            a parquet scan reads more than
                           ``wide_scan_cols`` columns — column
                           pruning likely lost (select early).
- ``many-exchanges``       more than ``max_exchanges`` shuffles in one
                           plan — look for a reusable partitioning or
                           a fused formulation.
- ``repeated-scan``        the same parquet relation is scanned more
                           than ``max_same_scans`` times in one plan —
                           Spark does not dedupe repeated references
                           to a subtree, so each reference re-reads
                           the files. Two scans are normal (the 1-row
                           anchor/totals pattern); 3+ means either the
                           scans prune to DIFFERENT narrow column sets
                           (fine), the query is the oracle-replay twin
                           of a stored-index path (fine — deployment
                           reads the index), or a shared intermediate
                           should be materialized/persisted at scale.

Each finding is a dict {rule, severity, detail}; an empty list is a
clean bill. ``assert_clean(df, allow=...)`` is the test-friendly
wrapper (used alongside tests/test_plan_lock.py, which pins the same
properties per registered query — the advisor is the ad-hoc/production
face of that gate).
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame

from etl_spark.plans.inspect import formatted_plan, node_count


def _scan_locations(plan: str) -> tuple[list[str], int]:
    """Parse every ``Location:`` line of a formatted plan into its
    full bracketed path. Returns ``(paths, unparsed)`` where
    ``unparsed`` counts Location lines with no parseable ``[path]``
    (Spark's formatted-explain field elision truncates long lines) —
    counted explicitly rather than silently skipped, so a plan full
    of unparseable scans can't pass the repeated-scan rule by
    accident (ADVICE r12). Pure function, unit-tested on synthetic
    plan text in tests/test_advisor.py."""
    locs: list[str] = []
    unparsed = 0
    for line in re.findall(r"Location: [^\n]*", plan):
        m = re.search(r"\[([^\]]+)\]", line)
        if m:
            locs.append(m.group(1))
        else:
            unparsed += 1
    return locs, unparsed


def lint_plan(
    df: DataFrame,
    max_exchanges: int = 6,
    wide_scan_cols: int = 24,
    max_same_scans: int = 2,
) -> list[dict]:
    plan = formatted_plan(df)
    findings: list[dict] = []

    n = node_count(plan, "CartesianProduct")
    if n:
        findings.append(
            {
                "rule": "cartesian",
                "severity": "high",
                "detail": f"{n} CartesianProduct node(s): O(n*m) pair "
                f"generation — add a join key, block/bucket the pair "
                f"space, or broadcast a bounded side",
            }
        )
    n = node_count(plan, "BroadcastNestedLoopJoin")
    if n:
        findings.append(
            {
                "rule": "nested-loop",
                "severity": "review",
                "detail": f"{n} BroadcastNestedLoopJoin node(s): fine "
                f"when the broadcast side is a 1-row/k-row aggregate "
                f"(the totals crossJoin pattern); a missing equi-join "
                f"key otherwise",
            }
        )
    n = node_count(plan, "BatchEvalPython")
    if n:
        findings.append(
            {
                "rule": "python-udf",
                "severity": "high",
                "detail": f"{n} row-at-a-time Python UDF node(s): use "
                f"pyspark.sql.functions builtins, or an Arrow-batched "
                f"pandas_udf when Python is unavoidable",
            }
        )

    # scans: '(N) Scan parquet ...' detail blocks carry ReadSchema /
    # PushedFilters lines; a Filter node whose child is the scan with
    # no pushed filters means the predicate runs post-scan
    scan_blocks = re.findall(
        r"\(\d+\) Scan parquet[^\n]*\n(?:[^\n]*\n)*?(?=\(\d+\)|\Z)", plan
    )
    for block in scan_blocks:
        m = re.search(r"ReadSchema: struct<([^>]*)>", block)
        if m and m.group(1).strip():
            ncols = m.group(1).count(",") + 1
            if ncols > wide_scan_cols:
                findings.append(
                    {
                        "rule": "wide-scan",
                        "severity": "review",
                        "detail": f"a parquet scan reads {ncols} columns "
                        f"(> {wide_scan_cols}): select the needed "
                        f"columns before wide transforms so pruning "
                        f"reaches the scan",
                    }
                )
    # tree walk: a Filter whose child chain reaches a parquet scan
    # within a few hops, where that scan pushed nothing (PushedFilters
    # empty or absent), evaluates its predicate post-scan. HAVING-style
    # filters above aggregates are NOT adjacent to a scan and don't
    # trip this. The tree section precedes the first detail block.
    # Every Filter line is examined and findings are deduped per scan
    # id — the r10 form broke out of the OUTER loop at the first
    # Filter-adjacent-to-scan pair, so a later unpushed filter in a
    # multi-scan plan was silently never reported (ADVICE r10).
    tree = plan.split("\n\n(", 1)[0]
    tree_lines = tree.splitlines()
    flagged_scans: set[str] = set()
    for i, ln in enumerate(tree_lines):
        if not re.search(r"\bFilter \(\d+\)", ln):
            continue
        for j in range(i + 1, min(i + 4, len(tree_lines))):
            ms = re.search(r"Scan parquet\s*\((\d+)\)", tree_lines[j])
            if not ms:
                continue
            scan_id = ms.group(1)
            block = re.search(
                rf"\({scan_id}\) Scan parquet.*?(?=\n\(\d+\)|\Z)",
                plan,
                re.S,
            )
            pushed = (
                re.search(r"PushedFilters: \[(.*?)\]", block.group(0))
                if block
                else None
            )
            if (
                pushed is None or not pushed.group(1).strip()
            ) and scan_id not in flagged_scans:
                flagged_scans.add(scan_id)
                findings.append(
                    {
                        "rule": "filter-not-pushed",
                        "severity": "review",
                        "detail": "a Filter sits directly above a "
                        "parquet scan that pushed no predicates — "
                        "casts/UDFs in the predicate usually block "
                        "pushdown",
                    }
                )
            break

    # repeated scans of one relation: count Location lines per FULL
    # bracketed path across the scan detail blocks (each block carries
    # ONE Location). Keying on the full path — not the basename —
    # keeps two distinct relations that share a basename (e.g.
    # orders.parquet under the base sf dir and under a replica tmp
    # dir) from merging into one count (ADVICE r12). The driver-side
    # anchor pattern legitimately scans a table twice; 3+ is worth a
    # look (see module docstring for the three legitimate shapes).
    locs, unparsed = _scan_locations(plan)
    for path, cnt in sorted(Counter(locs).items()):
        if cnt > max_same_scans:
            base = path.rsplit("/", 1)[-1].removesuffix(".parquet")
            findings.append(
                {
                    "rule": "repeated-scan",
                    "severity": "review",
                    "detail": f"relation '{base}' ({path}) is scanned "
                    f"{cnt} times in one plan (> {max_same_scans}): "
                    f"fine if each scan prunes to a different narrow "
                    f"column set or this is a stored-index path's "
                    f"in-plan oracle twin; otherwise materialize the "
                    f"shared intermediate",
                }
            )
    if unparsed:
        findings.append(
            {
                "rule": "unparsed-scan-location",
                "severity": "review",
                "detail": f"{unparsed} scan Location line(s) had no "
                f"parseable [path] (truncated by formatted-explain "
                f"elision) and were excluded from repeated-scan "
                f"counting — re-explain with a higher maxFields to "
                f"audit them",
            }
        )

    n = node_count(plan, "Exchange")
    if n > max_exchanges:
        findings.append(
            {
                "rule": "many-exchanges",
                "severity": "review",
                "detail": f"{n} Exchange nodes (> {max_exchanges}): "
                f"look for a reusable partitioning (same key across "
                f"stages), broadcastable dims, or a fused formulation",
            }
        )
    return findings


def assert_clean(df: DataFrame, allow: tuple[str, ...] = (), **kw) -> None:
    """Raise AssertionError with the full findings list when
    ``lint_plan`` reports anything outside ``allow``."""
    bad = [f for f in lint_plan(df, **kw) if f["rule"] not in allow]
    if bad:
        raise AssertionError(f"plan lint findings: {bad}")
