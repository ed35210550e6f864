"""Host quiet-band calibration constants — ONE definition site.

Shared by bench.py (the retry gate that decides when a record run may
start) and tools/bench_diff.py (the quiet-vs-quiet classification that
decides whether the cpu-proxy ratio may normalize deltas). Keeping
them here prevents the two from desynchronizing when the quiet record
is recalibrated (r9 review catch — the cpu value was previously
hardcoded in both files).

These are fixed anchors measured on quiet records, NOT read from the
last bench output: anchoring to the previous record would self-ratchet
(a loud run writes its inflated proxy, loosening the next run's gate —
exactly the failure the gate exists to prevent). Recalibrate by
editing here when the hardware class changes, citing the record run.
"""

# noop-job scheduler floor, r4 quiet record (SCALE.md floor analysis);
# bench.py gates at 1.3x this
QUIET_FLOOR = 0.057

# fixed single-thread python loop, r8 quiet record
CPU_PROXY_QUIET = 0.062

# fixed 32-partition codegen Spark job, r9 quiet record (the 14.568s
# bench run; SCALE.md r9 adjudication); bench.py gates at 1.3x this
SPARK_PROXY_QUIET = 0.105
