"""Dump .explain('formatted') for named queries into plans/r14/<name>_<tag>.txt.

    python scripts/r14_explain.py <tag> name [name ...]
    # tag = before | after
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from market_insights_app_spark.plans.registry import QUERIES
    from market_insights_app_spark.session import get_spark

    spark = get_spark(app_name="mias-r14-explain", cpus="8")
    os.makedirs("plans/r14", exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = f"plans/r14/{name}_{tag}.txt"
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        n_ex = buf.getvalue().count("Exchange")
        print(f"{path}: {n_ex} Exchange mentions")
    spark.stop()


if __name__ == "__main__":
    main()
