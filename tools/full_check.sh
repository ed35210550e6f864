#!/usr/bin/env bash
# One-shot verification: tests + oracle gates + plan audit + bench.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== lint: no plan->RDD conversion in pkg/ (VERDICT r10 item 6) =="
if grep -rn '\.rdd' sanef_election_dashboard_etl_spark/ --include='*.py'; then
    echo "FAIL: .rdd touch in pkg/ — forces full plan->RDD conversion"
    exit 1
fi

echo "== pytest =="
python -m pytest tests/ -q

echo "== oracle gate sf0.001 =="
python tools/check_oracle.py /root/testdata/sf0.001 | tail -2
echo "== oracle gate sf0.01 (driver scale) =="
python tools/check_oracle.py /root/testdata/sf0.01 | tail -2

echo "== plan assertions =="
python tools/explain_audit.py

echo "== pushdown-duplication audit =="
python tools/dup_expr_audit.py | tail -1

echo "== driver-protocol simulation (vanilla session) =="
python tools/driver_sim.py | tail -1

echo "== multi-JVM gate (real executors, real serialization) =="
SPARK_GRAFT_MASTER='local-cluster[2,4,2048]' SPARK_GRAFT_CPUS=8 \
    python tools/check_oracle.py /root/testdata/sf0.001 | tail -2

echo "== bench =="
python bench.py --record
