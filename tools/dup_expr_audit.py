"""Duplicated-expensive-expression audit over every registry plan.

The r8 jaccard postmortem (CLAUDE.md RATIO RULE): predicate pushdown
substitutes projection aliases into filters and join conditions with NO
cost check, so `withColumn(x, <expensive>)` + a consumer that references
x several times can evaluate the expensive expression many times per row
— dedup_jaccard_prefix's rounded-threshold filter evaluated
array_intersect 24x per candidate pair inside a BroadcastHashJoin
condition. Projections get codegen subexpression elimination; join
conditions and interpreted filters do NOT.

This tool builds (does not execute) every registry plan at sf0.001 and
flags any SINGLE PLAN LINE containing more than THRESHOLD occurrences of
one expensive-expression fragment. Whole-plan totals are deliberately
not used: unrolled iterations (pagerank, MMR stages, IVF probes) repeat
fragments across lines legitimately.

    python tools/dup_expr_audit.py [sf_dir]

Exits nonzero on a flag outside the known-benign allowlist.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from sanef_election_dashboard_etl_spark.queries import REGISTRY
from sanef_election_dashboard_etl_spark.session import get_spark

FRAGS = ["array_intersect", "collect_set", "xxhash64", "split(",
         "regexp_extract", "aggregate(", "zip_with", "md5(",
         "levenshtein", "sort_array"]
THRESHOLD = 6

# (query, fragment) pairs audited and adjudicated benign (r8):
ALLOW = {
    # one WholeStageCodegen Project: codegen subexpression elimination
    # evaluates the shared tokenize once per row
    ("text_token_stats", "split("),
    # 5 DISTINCT bloom positions x (word-index, bit-index) on the BATCH
    # side of the probe (bounded small side; corpus fp computed once)
    ("dedup_incremental_bloom", "md5("),
    # nprobe DISTINCT centroid-distance expressions unrolled in the
    # probe-assign Generate
    ("sim_topk_ivf", "zip_with"), ("sim_topk_ivf", "aggregate("),
    ("sim_topk_ivf_pq", "zip_with"), ("sim_topk_ivf_pq", "aggregate("),
    # k DISTINCT minhash seeds per signature line
    ("dedup_minhash_lsh", "xxhash64"),
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("dup-expr-audit")
    spark.sparkContext.setLogLevel("ERROR")
    flags: list[tuple[int, str, str, str]] = []
    skipped: list[str] = []
    for name, q in REGISTRY.items():
        try:
            plan = (q.fn(spark, sf_dir)._jdf.queryExecution()
                    .executedPlan().toString())
        except Exception as e:  # audit must see every plan it can build
            skipped.append(name)
            print(f"[skip] {name}: {str(e)[:90]}")
            continue
        best: dict[str, tuple[int, str]] = {}
        for line in plan.splitlines():
            op = line.strip().lstrip("+-*:( ").split(" ")[0][:30]
            for f in FRAGS:
                c = line.count(f)
                if c > THRESHOLD and c > best.get(f, (0, ""))[0]:
                    best[f] = (c, op)
        for f, (c, op) in best.items():
            flags.append((c, name, f, op))

    bad = [(c, n, f, op) for c, n, f, op in flags if (n, f) not in ALLOW]
    for c, n, f, op in sorted(flags, reverse=True):
        mark = "BENIGN" if (n, f) in ALLOW else "FLAG  "
        print(f"{mark} {c:4d}x/line {f:18s} {op:30s} {n}")
    if bad:
        print(f"\n{len(bad)} un-adjudicated duplication flag(s) — inspect "
              "the plan; if the evaluation site is bounded or CSE'd, add "
              "to ALLOW with a reason; else restructure (see "
              "dedup._keep_ratio_ge for the filter pattern)")
        return 1
    # ADVICE r8: a plan that fails to BUILD silently dropped out of the
    # sweep while the audit still exited 0 — coverage loss must fail.
    # (Registry plans all build in a healthy tree; any skip is a
    # regression in the entry itself, not an environment quirk.)
    if skipped:
        print(f"\n{len(skipped)} plan(s) failed to build and escaped the "
              f"sweep: {skipped} — fix the entries; the audit cannot "
              "vouch for plans it never saw")
        return 1
    print(f"\nall {len(flags)} per-line duplication flags adjudicated "
          f"benign across {len(REGISTRY)} plans (0 skipped)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
