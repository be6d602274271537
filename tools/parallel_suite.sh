#!/usr/bin/env bash
# Sharded full-suite run: N pytest subprocesses, each its own Spark JVM
# on local[CPUS/N] threads and its own warehouse dir, selecting a
# disjoint deterministic slice of the suite via SPARK_GRAFT_SHARD=i/n
# (tests/conftest.py). The union of the shards is exactly one full
# suite; pass/fail counts per shard print at the end.
#
# Why not pytest-xdist: not installed, installs are off-limits
# (VERDICT r6 item 4). Why this is safe: the oracle-parity sweep is
# hundreds of INDEPENDENT Spark+DuckDB compares; shards share nothing
# but the read-only testdata. saveAsTable entries are isolated per
# shard by SPARK_GRAFT_WAREHOUSE_DIR (session.py).
#
# Usage: tools/parallel_suite.sh [n_shards] [cpus_per_shard]
# Default 4 shards x 8 threads = the box's 32 cores.
set -u
N=${1:-4}
CPUS=${2:-8}
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
RUNDIR=$(mktemp -d /tmp/parallel_suite.XXXXXX)
echo "shards=$N cpus_per_shard=$CPUS logs=$RUNDIR"

pids=()
for i in $(seq 0 $((N - 1))); do
  (
    cd "$ROOT" &&
      SPARK_GRAFT_SHARD="$i/$N" \
      SPARK_GRAFT_CPUS="$CPUS" \
      SPARK_GRAFT_DRIVER_MEM=12g \
      SPARK_GRAFT_WAREHOUSE_DIR="$RUNDIR/warehouse-$i" \
      python -m pytest tests/ -q -rs -p no:cacheprovider \
        >"$RUNDIR/shard-$i.log" 2>&1
  ) &
  pids+=($!)
done

fail=0
for i in $(seq 0 $((N - 1))); do
  wait "${pids[$i]}"
  rc=$?
  # pytest exit 5 = "no tests collected": an empty shard (tiny suite or
  # huge N) is not a failure — the union across shards is still complete
  [ $rc -ne 0 ] && [ $rc -ne 5 ] && fail=1
  tail -n 2 "$RUNDIR/shard-$i.log" | sed "s/^/shard $i: /"
done
echo "overall: $([ $fail -eq 0 ] && echo PASS || echo FAIL) (logs: $RUNDIR)"
exit $fail
