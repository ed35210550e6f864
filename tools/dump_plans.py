"""Dump `.explain("formatted")` for named registry queries to files.

Usage: python tools/dump_plans.py OUTDIR SUFFIX query [query ...]
       [--repo /path/to/tree] [--sf-dir /root/testdata/sf0.1]

Writes OUTDIR/<query>_<SUFFIX>.txt. `--repo` lets the dump run against a
different checkout (e.g. a `git archive` of the pre-change commit) so
before/after plan evidence comes from the real trees.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("suffix")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--repo", default=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args(argv)

    sys.path.insert(0, args.repo)
    from sanef_election_dashboard_etl_spark.queries import REGISTRY
    from sanef_election_dashboard_etl_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.outdir, exist_ok=True)
    for name in args.queries:
        df = REGISTRY[name].fn(spark, args.sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(args.outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print("wrote", path)


if __name__ == "__main__":
    main()
