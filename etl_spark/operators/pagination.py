"""Pagination + preview helpers (SURVEY.md §2.6 O4/O5, §2.4 A8).

The reference paginates every dashboard listing with `LIMIT ? OFFSET
?` plus a separate COUNT(*) and `ceil(total/per_page)` page math
(web_scheduler.py:5261-5288), clamping per_page to 100 (:5239,
:5336). Same semantics here, with the caveat the reference never
documents: OFFSET pagination is only stable when the sort ends in a
unique key — callers must pass one (all fixture tables have one).

Scale note: OFFSET n is O(n) — every page re-sorts and skips. For
deep pagination over big results, keyset pagination (WHERE last_seen
< cursor ORDER BY ... LIMIT k) is the 100 TB form; `paginate` covers
the reference's bounded dashboards (per_page ≤ 100, shallow pages).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame

MAX_PER_PAGE = 100  # web_scheduler.py:5239


@dataclass(frozen=True)
class Page:
    rows: DataFrame
    total: int
    pages: int
    page: int
    per_page: int


def paginate(
    df: DataFrame,
    order_keys: list[Column | str],
    page: int = 1,
    per_page: int = 20,
) -> Page:
    """One dashboard page plus the A8 page math. ``order_keys`` must
    end in a unique column for stable pages."""
    per_page = max(1, min(per_page, MAX_PER_PAGE))
    page = max(1, page)
    total = df.count()
    pages = math.ceil(total / per_page) if total else 0
    rows = df.orderBy(*order_keys).offset((page - 1) * per_page).limit(per_page)
    return Page(rows=rows, total=total, pages=pages, page=page, per_page=per_page)


def head_preview(df: DataFrame, n: int = 10) -> list[dict]:
    """O5 head-N preview — the reference logs the first 10 rows of
    every alert result into its audit trail (web_scheduler.py:
    3458-3466). Collects only n rows; the plan is a LocalLimit pushed
    to the scan."""
    return [r.asDict() for r in df.limit(n).collect()]
