"""Same-session interleaved A/B bench — the repo's only trusted
cross-tree perf instrument, packaged (VERDICT r9 item 7).

Cross-round raw bench deltas are unreliable at the ±25% level on this
host (SCALE.md r9 adjudication: 32-way Spark throughput drifts between
rounds while every single-thread instrument — cpu proxy, steal,
bandwidth — reads quiet, and per-query cross-JVM drift reaches 1.5x).
The only method that has resolved code effects here is the interleaved
fresh-JVM A/B: extract the old tree with `git archive`, then alternate
timing runs HEAD, ref, HEAD, ref on identical data, each in its own
JVM, best-of-N reps per run. This tool is that recipe as a command:

    python tools/ab_bench.py <ref> <query...> [--pairs 2] [--reps 3]
        [--sf-dir /root/testdata/sf0.1] [--record BENCH_r08.json]

Prints the SCALE.md adjudication-table format (markdown) plus a
per-query verdict:

    | query | <record> | HEAD run1 | <ref> run1 | HEAD run2 | <ref> run2 | verdict |

Verdict rule mirrors bench_diff's flag band: HEAD is 'slower'/'faster'
only when |min-over-HEAD-runs - min-over-ref-runs| exceeds
max(within-tree run spread, 30 ms); otherwise '~ (within jitter)'.
Because the runs interleave within minutes on one host, ambient drift
hits both trees alike — no band division needed.

Side-effect-free: extracts to /tmp, prints to stdout, writes nothing
in the repo (paste the table into SCALE.md when adjudicating).

Timing methodology matches bench.py exactly (same micro-scale
calibration, clearCache per rep, plan build off the clock, noop-format
writes) so numbers are comparable with BENCH_DETAIL/BENCH_rN records
taken at the same sf.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Child runner: one fresh JVM, times the named registry queries with
# bench.py's methodology, prints ABRESULT <json> as the last line.
_RUNNER = r"""
import json, os, sys, time
tree, sf_dir, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
names = sys.argv[4:]
sys.path.insert(0, tree)
from sanef_election_dashboard_etl_spark.queries import REGISTRY
from sanef_election_dashboard_etl_spark.session import TUNE_OVERRIDES, get_spark
spark = get_spark("ab-bench")
spark.sparkContext.setLogLevel("ERROR")
li = os.path.join(sf_dir, "lineitem.parquet")
nbytes = (sum(e.stat().st_size for e in os.scandir(li))
          if os.path.isdir(li) else os.path.getsize(li))
if nbytes <= (100 << 20):  # bench.py micro-scale calibration
    TUNE_OVERRIDES.update({"spark.sql.adaptive.enabled": "false",
                           "spark.sql.shuffle.partitions": "4"})

def run_full(df):
    df.write.format("noop").mode("overwrite").save()

REGISTRY["a3_count_two_keys"].fn(spark, sf_dir).count()  # JVM/codegen warm
out = {}
for name in names:
    if name not in REGISTRY:   # older tree predating the query
        out[name] = None
        continue
    df = REGISTRY[name].fn(spark, sf_dir)
    spark.catalog.clearCache()
    run_full(df)               # warm rep, off the clock
    best = float("inf")
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        run_full(df)
        best = min(best, time.perf_counter() - t0)
    out[name] = round(best, 3)
print("ABRESULT " + json.dumps(out))
"""


def extract_tree(ref: str) -> str:
    """git-archive `ref` into a fresh /tmp tree; returns the path."""
    safe = ref.replace("/", "_")
    dest = os.path.join(tempfile.gettempdir(), f"ab_bench_{safe}")
    if os.path.exists(dest):
        shutil.rmtree(dest)
    os.makedirs(dest)
    ar = subprocess.run(["git", "archive", ref], cwd=ROOT,
                        stdout=subprocess.PIPE, check=True)
    subprocess.run(["tar", "-x", "-C", dest], input=ar.stdout, check=True)
    return dest


def time_tree(tree: str, sf_dir: str, reps: int,
              queries: list[str]) -> dict[str, float | None]:
    with tempfile.NamedTemporaryFile("w", suffix="_ab_runner.py",
                                     delete=False) as f:
        f.write(_RUNNER)
        runner = f.name
    try:
        proc = subprocess.run(
            [sys.executable, runner, tree, sf_dir, str(reps), *queries],
            cwd=tree, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True, check=False)
        for line in reversed(proc.stdout.splitlines()):
            if line.startswith("ABRESULT "):
                return json.loads(line[len("ABRESULT "):])
        raise SystemExit(
            f"ab_bench: runner produced no ABRESULT line (rc={proc.returncode}); "
            f"tail: {proc.stdout[-500:]!r}")
    finally:
        os.unlink(runner)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("ref", help="git ref of the baseline tree (e.g. 0617063)")
    ap.add_argument("queries", nargs="+", help="registry query names")
    ap.add_argument("--pairs", type=int, default=2,
                    help="interleaved HEAD/ref run pairs (default 2)")
    ap.add_argument("--reps", type=int, default=3,
                    help="timed reps per run, best-of (default 3)")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--record", default=None,
                    help="BENCH_rN.json whose parsed queries become the "
                         "record column")
    args = ap.parse_args(argv)

    record = {}
    rec_name = ""
    if args.record:
        p = args.record if os.path.isabs(args.record) \
            else os.path.join(ROOT, args.record)
        with open(p) as f:
            d = json.load(f)
        record = (d.get("parsed") or d).get("queries", {})
        rec_name = os.path.basename(args.record).replace(".json", "") + " record"

    ref_tree = extract_tree(args.ref)
    print(f"# ab_bench: HEAD (working tree) vs {args.ref} "
          f"({args.pairs} interleaved pairs, best-of-{args.reps} reps, "
          f"sf_dir={args.sf_dir})", file=sys.stderr)

    head_runs: list[dict] = []
    ref_runs: list[dict] = []
    for i in range(args.pairs):
        print(f"[ab] HEAD run{i + 1} ...", file=sys.stderr)
        head_runs.append(time_tree(ROOT, args.sf_dir, args.reps, args.queries))
        print(f"[ab] {args.ref} run{i + 1} ...", file=sys.stderr)
        ref_runs.append(time_tree(ref_tree, args.sf_dir, args.reps,
                                  args.queries))

    cols = ["query"] + ([rec_name] if record else [])
    for i in range(args.pairs):
        cols += [f"HEAD run{i + 1}", f"{args.ref}-tree run{i + 1}"]
    cols.append("verdict")
    lines = ["| " + " | ".join(cols) + " |",
             "|" + "---|" * len(cols)]
    MIN_S = 0.030
    any_slower = False
    for q in args.queries:
        hs = [r[q] for r in head_runs if r.get(q) is not None]
        rs = [r[q] for r in ref_runs if r.get(q) is not None]
        cells = [q] + ([f"{record[q]:.3f}" if q in record else "—"]
                       if record else [])
        for i in range(args.pairs):
            cells.append("—" if head_runs[i].get(q) is None
                         else f"{head_runs[i][q]:.3f}")
            cells.append("—" if ref_runs[i].get(q) is None
                         else f"{ref_runs[i][q]:.3f}")
        if hs and rs:
            delta = min(hs) - min(rs)
            jitter = max(max(hs) - min(hs) if len(hs) > 1 else 0.0,
                         max(rs) - min(rs) if len(rs) > 1 else 0.0,
                         MIN_S)
            if delta > jitter:
                verdict = f"HEAD slower (+{delta:.3f} > jitter {jitter:.3f})"
                any_slower = True
            elif delta < -jitter:
                verdict = f"HEAD faster ({delta:.3f})"
            else:
                verdict = "~ (within jitter)"
        else:
            verdict = "ref tree lacks query" if hs else "HEAD lacks query"
        cells.append(verdict)
        lines.append("| " + " | ".join(cells) + " |")
    print("\n".join(lines))
    return 1 if any_slower else 0


if __name__ == "__main__":
    raise SystemExit(main())
