#!/usr/bin/env python3
"""Fixture canary — detect driver testdata regeneration between rounds.

VERDICT r5 item 1a/8: `profile_dataset_fingerprint` went driver-red in
r5 while the identical entry passes locally at every scale, and
CLAUDE.md records one PRIOR real instance of driver fixture drift (the
events.ts TIMESTAMP(NANOS)->MICROS encoding change between r2 and r3).
This tool makes drift observable: for every parquet table in a testdata
dir it records (n_rows, xor_fp) where xor_fp is the same portable
60-bit md5 row digest the engine's dataset_fingerprint uses
(operators/profile.py:219), folded with bit_xor — order-independent,
engine-recomputable, cheap (DuckDB, no Spark startup).

Usage:
    python tools/fixture_canary.py [sf_dir ...]      # print table
    python tools/fixture_canary.py --check [sf_dir]  # diff vs FIXTURES.md
                                                     # snapshot, exit 1 on drift

The canonical snapshot lives in FIXTURES.md ("Fixture canary" section,
one fenced block per sf dir). `--check` compares the live computation
against that snapshot and prints a per-table diff — run it at round
start (CLAUDE.md ritual) and before trusting any driver-red row on a
whole-table-sensitive query. check_oracle.py calls `--check` in warn
mode automatically.

Timestamp columns are canonicalized to epoch microseconds before
hashing so a storage-encoding change (NANOS vs MICROS vs NTZ) with
identical instants does NOT trip the canary — only value drift does.
That mirrors the engine's catalog.table normalization.
"""
from __future__ import annotations

import glob
import os
import re
import sys

import duckdb

DEFAULT_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
                "/root/testdata/sf0.1"]
FIXTURES_MD = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "FIXTURES.md")


def table_fingerprint(con, path: str) -> tuple[int, int]:
    """(n_rows, xor_fp) over ALL columns of one parquet file, using the
    portable 60-bit md5 digest (profile.dataset_fingerprint
    discipline): concat_ws(0x1f, string casts, null->''), first 15 hex
    chars -> bigint, bit_xor fold. Timestamps hash as epoch micros."""
    cols = con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{path}')").fetchall()
    parts = []
    for name, dtype, *_ in cols:
        q = f'"{name}"'
        if dtype.upper().startswith("TIMESTAMP"):
            expr = f"CAST(epoch_us({q}) AS VARCHAR)"
        elif dtype.upper().startswith(("DOUBLE[", "FLOAT[", "BIGINT[",
                                       "INTEGER[", "REAL[")):
            expr = f"CAST(to_json({q}) AS VARCHAR)"
        else:
            expr = f"CAST({q} AS VARCHAR)"
        parts.append(f"coalesce({expr}, '')")
    concat = "concat_ws(chr(31), " + ", ".join(parts) + ")"
    row = con.execute(f"""
        SELECT CAST(COUNT(*) AS BIGINT),
               coalesce(bit_xor(('0x' || substr(md5({concat}), 1, 15))
                        ::BIGINT), 0)
        FROM read_parquet('{path}')
    """).fetchone()
    return int(row[0]), int(row[1])


def scan_dir(sf_dir: str) -> dict[str, tuple[int, int]]:
    con = duckdb.connect()
    out = {}
    for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        t = os.path.basename(p).rsplit(".", 1)[0]
        out[t] = table_fingerprint(con, p)
    return out


def parse_snapshot(sf_dir: str) -> dict[str, tuple[int, int]] | None:
    """Read the committed canary block for sf_dir out of FIXTURES.md."""
    try:
        text = open(FIXTURES_MD).read()
    except OSError:
        return None
    m = re.search(
        r"```canary %s\n(.*?)```" % re.escape(sf_dir), text, re.S)
    if not m:
        return None
    snap = {}
    for line in m.group(1).strip().splitlines():
        t, n, x = line.split()
        snap[t] = (int(n), int(x))
    return snap


def render_block(sf_dir: str, fps: dict[str, tuple[int, int]]) -> str:
    lines = [f"```canary {sf_dir}"]
    for t, (n, x) in sorted(fps.items()):
        lines.append(f"{t} {n} {x}")
    lines.append("```")
    return "\n".join(lines)


def check(sf_dir: str) -> int:
    """Compare live vs snapshot; 0 = match, 1 = drift, 2 = no snapshot."""
    snap = parse_snapshot(sf_dir)
    live = scan_dir(sf_dir)
    if snap is None:
        print(f"[canary] no snapshot for {sf_dir} in FIXTURES.md — "
              f"commit one with:\n{render_block(sf_dir, live)}")
        return 2
    drift = []
    for t in sorted(set(snap) | set(live)):
        if snap.get(t) != live.get(t):
            drift.append(
                f"  {t}: snapshot={snap.get(t)} live={live.get(t)}")
    if drift:
        print(f"[canary] FIXTURE DRIFT in {sf_dir} "
              f"({len(drift)} table(s)) — the driver regenerated "
              f"testdata; whole-table-sensitive oracle rows from before "
              f"this point are not comparable:")
        print("\n".join(drift))
        return 1
    print(f"[canary] {sf_dir}: {len(live)} tables match the committed "
          f"snapshot")
    return 0


def main(argv: list[str]) -> int:
    if argv and argv[0] == "--check":
        dirs = argv[1:] or DEFAULT_DIRS[:1]
        # track drift and missing-snapshot separately (ADVICE r6: with
        # max()-folding, a missing snapshot (rc=2) in one dir masked
        # real drift (rc=1) in another and the tool exited 0)
        results = [check(d) for d in dirs]  # check ALL dirs (no short-circuit)
        return 1 if 1 in results else 0  # missing snapshot warns, not fails
    dirs = argv or DEFAULT_DIRS
    for d in dirs:
        if not os.path.isdir(d):
            continue
        print(render_block(d, scan_dir(d)))
        print()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
