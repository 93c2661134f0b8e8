"""Compute the next round's driver window (the oldest-first rotation
tests/test_window_rotation.py enforces) and print it as the
`_DRIVER_WINDOW_PRIORITY` tuple body, ready to paste into
etl_spark/registry.py.

Policy (one definition, shared with the test's checks):
  1. never-driver-checked oracle-backed queries, registration order
     (new registrations lead automatically — stale = -1);
  2. then oldest last-green round first, registration order within a
     round;
  3. ``oracle=None`` queries are never given a slot.

Run at round start, AFTER the previous round's CORRECTNESS file is
committed:  python tools/rotate_window.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW_SIZE = 50


def main() -> None:
    from etl_spark.registry import _REGISTRY, _ensure_loaded

    _ensure_loaded()
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            d = json.load(fh)
        for k in d.get("queries", d):
            last[k] = max(last.get(k, -1), rnd)

    reg_order = {n: i for i, n in enumerate(_REGISTRY)}
    eligible = [n for n, s in _REGISTRY.items() if s.oracle is not None]
    ranked = sorted(eligible, key=lambda n: (last.get(n, -1), reg_order[n]))
    window = ranked[:WINDOW_SIZE]

    print(f"# next-round window ({WINDOW_SIZE} slots), oldest-first:")
    cur = None
    for n in window:
        stale = last.get(n, -1)
        if stale != cur:
            cur = stale
            label = "never driver-checked" if stale == -1 else f"last green r{stale}"
            print(f"    # -- {label}")
        print(f'    "{n}",')
    left_out = [n for n in ranked[WINDOW_SIZE:] if last.get(n, -1) <= last.get(window[-1], -1)]
    if left_out:
        print(f"# deferred to the round after ({len(left_out)} at the same or newer staleness):")
        print("#   " + ", ".join(left_out[:25]) + (" ..." if len(left_out) > 25 else ""))


if __name__ == "__main__":
    main()
