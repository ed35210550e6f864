"""Driver-protocol simulation: import __spark_entry__ exactly as the round
driver does, with a VANILLA SparkSession (no engine builder confs — the
driver constructs its own), run entry() + all queries() vs oracle_sql()
through DuckDB, compare rowcount/columns/values.

    python tools/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

from tools.check_oracle import canon


def _vanilla() -> SparkSession:
    spark = (SparkSession.builder.master("local[32]")
             .appName("driver-sim").getOrCreate())  # deliberately untuned
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as C

    spark = _vanilla()

    smoke = C.entry(spark)
    n = len(smoke.collect())
    assert n > 0 and smoke.schema is not None
    print(f"entry smoke: {n} rows")

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = C.queries(), C.oracle_sql()
    failures = []
    for i, (name, fn) in enumerate(qs.items()):
        # The real driver runs ONE 50-query window per vanilla session;
        # replaying all 244 in a single untuned (1g-heap) JVM is a
        # stricter test than any driver performs and tips the heap over
        # around query ~210 (r8: cumulative UI/status-store/codegen
        # growth, not any single query — each FAILing query passes in a
        # fresh vanilla session). Recycle per 50 to match the protocol.
        if i > 0 and i % 50 == 0:
            spark.stop()
            spark = _vanilla()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: spark {type(exc).__name__}: {exc}")
            continue
        if name not in oracles:
            status = "rows-only"
            print(f"ok   {name}: {status} ({len(srows)} rows)")
            continue
        rel = con.sql(oracles[name])
        orows, ocols = rel.fetchall(), rel.columns
        if len(srows) != len(orows) or \
                canon(srows, scols) != canon(orows, ocols):
            failures.append(name)
            print(f"FAIL {name}: mismatch rows {len(srows)} vs {len(orows)}")
        else:
            print(f"ok   {name}: {len(srows)} rows match")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} pass (vanilla session)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
