"""Round bookkeeping gate (VERDICT r13 nit #1 — three consecutive
rounds shipped with BENCH_r{N}.json / CORRECTNESS_r{N}.json untracked
and BENCH_LOCAL.json / LEAKCHECK.json dirty).

Run at ROUND OPEN (before the first commit) and again before the
sealing commit:

    python tools/seal_round.py

Exit 0 iff every driver artifact is clean in git (tracked AND
unmodified). Exit 1 with the offending paths otherwise — stage them
into the current commit first. Artifacts checked: all BENCH_r*.json,
BENCH_QUIET_r*.json, CORRECTNESS_r*.json, plus BENCH_LOCAL.json,
LEAKCHECK.json, COPYCHECK.json, PROGRESS.jsonl.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FIXED = ["BENCH_LOCAL.json", "LEAKCHECK.json", "COPYCHECK.json", "PROGRESS.jsonl"]
PATTERNS = ["BENCH_r*.json", "BENCH_QUIET_r*.json", "CORRECTNESS_r*.json"]


def main() -> int:
    paths = [p for p in FIXED if os.path.exists(os.path.join(REPO, p))]
    for pat in PATTERNS:
        paths += sorted(
            os.path.basename(p) for p in glob.glob(os.path.join(REPO, pat))
        )
    out = subprocess.run(
        ["git", "status", "--porcelain", "--"] + paths,
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    # porcelain XY: X = index, Y = worktree. STAGED artifacts (Y == ' ')
    # are fine — they land in the commit being built; flag only
    # untracked (??) or worktree-dirty (Y != ' ') entries.
    dirty = [
        line
        for line in out.splitlines()
        if line.strip() and (line.startswith("??") or line[1] != " ")
    ]
    if dirty:
        print("driver artifacts not sealed — stage these into the commit:")
        for line in dirty:
            print("   ", line)
        return 1
    print(f"all {len(paths)} driver artifacts tracked and clean/staged")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
