"""Dump .explain('formatted') for a list of queries into plans/r15/
with a _before/_after suffix (the judge-checkable deliverable for the
r15 optimization round).

    python tools/dump_plans_r15.py before q1 q2 ...
    python tools/dump_plans_r15.py after  q1 q2 ...
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_spark.registry import all_specs  # noqa: E402
from etl_spark.session import get_spark  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="dump-plans-r15")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    for name in names:
        df = specs[name].fn(spark, sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
