"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every registry query at a given sf dir in BOTH Spark and DuckDB and
compares row count, column names, and an order-insensitive value hash
(rows sorted, columns sorted by name, values stringified). Run:

    python tools/check_oracle.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

from sanef_election_dashboard_etl_spark.catalog import TABLES
from sanef_election_dashboard_etl_spark.queries import REGISTRY
from sanef_election_dashboard_etl_spark.session import get_spark


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_value(r[i]) for i in order) for r in rows)
    return out


def driver_canon_replay(srows, scols) -> str | None:
    """Replay the driver's rows-only canonicalization (r8 postmortem,
    VERDICT r8 item 2): the driver pandas-DataFrames the result and
    sort_values over ALL columns; unhashable cells (ndarray/list from
    array columns, dict from maps) die in Categorical.factorize exactly
    as text_bpe_tokenize did in the r8 window while this gate — which
    only counted rows — stayed green. Returns an error string when the
    canonicalization would fail driver-side, else None."""
    import pandas as pd

    try:
        pdf = pd.DataFrame(srows, columns=list(scols))
        if len(pdf.columns):
            pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    except Exception as exc:
        return f"driver canon replay failed: {type(exc).__name__}: {exc}"
    return None


def rows_only_schema_lint(sdf) -> str | None:
    """Driver canon contract: no top-level array/map/struct column may
    appear in an oracle-less entry's output (the driver sorts every
    column; complex cells are unhashable under pandas factorize).
    Project a scalar surface in the REGISTRY entry instead
    (array_join / to_json), keeping the rich type on the operator API."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [f.name for f in sdf.schema.fields
           if isinstance(f.dataType, (ArrayType, MapType, StructType))]
    if bad:
        return ("complex top-level columns in rows-only output "
                f"(driver canon contract): {bad}")
    return None


def band_check(con, q, srows, scols) -> str | None:
    """Tolerance compare for sketch ops (r8, VERDICT r7 item 6): run the
    entry's EXACT-reference band_oracle in DuckDB, match rows on the
    non-numeric key columns, and require every numeric value within
    band_eps relative error of the reference (row counts exact in the
    tolerance too — n_rows-style carried counts ride the same band).
    Returns an error string, or None when the band holds."""
    rel = con.sql(q.band_oracle)
    ocols, orows = rel.columns, rel.fetchall()
    if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
        return f"cols spark={sorted(scols)} reference={sorted(ocols)}"
    if len(srows) != len(orows):
        return f"rowcount spark={len(srows)} reference={len(orows)}"

    from decimal import Decimal
    num = (int, float, Decimal)

    def split(rows, cols):
        keyed = {}
        for r in rows:
            vals = dict(zip([c.lower() for c in cols], r))
            key = tuple(str(vals[c]) for c in sorted(vals)
                        if not isinstance(vals[c], num)
                        or isinstance(vals[c], bool))
            keyed[key] = vals
        return keyed

    sk, ok_ = split(srows, scols), split(orows, ocols)
    if set(sk) != set(ok_):
        return f"key mismatch: {sorted(set(sk) ^ set(ok_))[:3]}"
    for key, svals in sk.items():
        for c, sv in svals.items():
            ov = ok_[key][c]
            if isinstance(sv, bool) or not isinstance(sv, num):
                continue
            sv, ov = float(sv), float(ov)
            if abs(sv - ov) > q.band_eps * max(abs(ov), 1.0):
                return (f"{c}@{key}: spark={sv} reference={ov} "
                        f"rel={abs(sv - ov) / max(abs(ov), 1.0):.4f}")
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]
    # Fixture canary first (VERDICT r5 item 8): a regenerated testdata
    # dir silently invalidates whole-table-sensitive comparisons — warn
    # loudly but keep running (the gate itself still self-consistently
    # compares Spark vs DuckDB on whatever data is there).
    if sf_dir.startswith("/root/testdata/"):
        try:
            from fixture_canary import check as canary_check
            canary_check(sf_dir)
        except Exception as e:  # canary must never block the gate
            print(f"[canary] skipped ({e})")
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written dataset directory
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    for name, q in REGISTRY.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(exc).__name__}: {exc}")
            continue
        if q.oracle is None:
            err = rows_only_schema_lint(sdf) or \
                driver_canon_replay(srows, scols)
            if err:
                failures.append(name)
                print(f"FAIL {name}: {err}")
                continue
            if q.band_oracle is not None:
                err = band_check(con, q, srows, scols)
                if err:
                    failures.append(name)
                    print(f"FAIL {name}: band check — {err}")
                else:
                    print(f"ok   {name}: rows-only + band<= "
                          f"{q.band_eps:g} ({len(srows)} rows, "
                          f"{time.time()-t0:.1f}s)")
                continue
            print(f"ok   {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            if len(srows) == 0:
                print(f"     WARN {name}: 0 rows (weak check)")
            continue
        try:
            rel = con.sql(q.oracle)
            ocols = rel.columns
            orows = rel.fetchall()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {exc}")
            continue
        ok = True
        if len(srows) != len(orows):
            ok = False
            print(f"FAIL {name}: rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            ok = False
            print(f"FAIL {name}: cols spark={sorted(scols)} duckdb={sorted(ocols)}")
        else:
            # dtype audit: normalize both engines' types to a common
            # vocabulary. hugeint is deliberately NOT normalized: DuckDB
            # SUM(BIGINT) -> HUGEINT becomes float64 under the driver's
            # pandas conversion and hash-mismatches (round-1 postmortem) —
            # every oracle must CAST(SUM(..) AS BIGINT) in its final
            # projection so hugeint never escapes.
            NORM = {"tinyint": "int", "smallint": "int", "integer": "int",
                    "bigint": "long", "int32": "int",
                    "int64": "long", "float": "double", "real": "double",
                    "varchar": "string", "text": "string",
                    "timestamp_ns": "timestamp", "timestamp with time zone":
                    "timestamp", "boolean": "bool"}

            def norm(t):
                t = str(t).lower()
                if t.startswith("decimal"):
                    return "decimal"
                return NORM.get(t, t)

            sd = {c.lower(): norm(t) for c, t in sdf.dtypes}
            od = {c.lower(): norm(str(t)) for c, t in zip(rel.columns, rel.types)}
            for c in sd:
                if sd[c] != od.get(c):
                    ok = False
                    print(f"FAIL {name}: dtype mismatch col={c} "
                          f"spark={sd[c]} duckdb={od.get(c)}")
        if ok:
            cs, co = canon(srows, scols), canon(orows, ocols)
            if cs != co:
                ok = False
                diff = [(a, b) for a, b in zip(cs, co) if a != b][:3]
                print(f"FAIL {name}: value mismatch, first diffs: {diff}")
        if ok:
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")
            if len(srows) == 0:
                print(f"     WARN {name}: 0 rows (weak check)")
        else:
            failures.append(name)
    print(f"\n{len(REGISTRY) - len(failures)}/{len(REGISTRY)} pass")
    if failures:
        print("failing:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
