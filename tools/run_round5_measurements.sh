#!/bin/bash
# Round-5 on-chip measurement sequence — ONE TPU job at a time, in order.
# Run from /root/repo in a foreground shell (nohup ok): the axon env must
# be present.  Logs under /tmp/r5_*.log; poll them, never run two at once.
set -u
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name: $(date +%H:%M:%S) ==="
  timeout 3600 "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "--- rc=$? tail:"; tail -3 "/tmp/r5_${name}.log"
}
run bench     python -u bench.py
run irfft     python -u tools/probe_irfft_mxu.py
run beyond    python -u tools/perf_beyond.py
run beyond2   python -u tools/perf_beyond2.py
run benchfull python -u bench_full.py
echo "=== all done $(date +%H:%M:%S) ==="
