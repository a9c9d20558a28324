"""TRUE multi-process validation of the multihost (DCN) transform path.

The virtual 8-device mesh used by the test suite lives in ONE process, so
its "host" axis never actually crosses a process boundary.  This check
launches 2 real controller processes (4 virtual CPU devices each) connected
through jax.distributed's Gloo transport, rebuilds the ("host","chip") mesh
from the genuine process topology, and verifies that
modwt_multilevel_multihost / imodwt_multilevel_multihost produce
machine-precision parity with the single-device transform for every
boundary mode — with each process feeding only its OWN batch rows, exactly
as a real DCN deployment would.

Prints one JSON line; exit 0 iff every check passes.
Run: python tools/multiproc_dcn_check.py
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

TOL = 1e-5  # f32 machine-precision contract of the tiled engine


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def main() -> int:
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)), "dcn_worker.py")
    port = free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    results, errs = [], []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
        for line in out.splitlines():
            if line.startswith("RESULT "):
                results.append(json.loads(line[len("RESULT "):]))
        if p.returncode != 0:
            errs.append(err[-2000:])

    ok = len(results) == 2 and not errs
    summary = {"processes": len(results), "checks": {}}
    for res in sorted(results, key=lambda r: r["pid"]):
        for key, val in res.items():
            if key == "pid":
                continue
            summary["checks"][f"p{res['pid']}_{key}"] = val
            if key.startswith(("fwd_", "inverse_", "roundtrip_")) and val > TOL:
                ok = False
            if key == "dcn_bytes_per_host" and val != 0:
                ok = False
    summary["ok"] = ok
    if errs:
        summary["errors"] = errs
    print(json.dumps(summary))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
