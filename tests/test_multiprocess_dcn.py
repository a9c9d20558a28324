"""True multi-controller validation of the multihost (DCN) path.

The rest of the suite exercises the ("host","chip") mesh inside ONE process,
where the host axis is only simulated.  This test launches two real
controller processes connected through jax.distributed (Gloo transport — the
CPU stand-in for DCN), each owning one mesh host row and feeding only its
own batch rows, and asserts machine-precision parity of
``modwt_multilevel_multihost`` / ``imodwt_multilevel_multihost`` with the
single-device transform for every boundary mode.  See
``tools/multiproc_dcn_check.py`` / ``tools/dcn_worker.py``.
"""

import json
import pathlib
import subprocess
import sys
import pytest

pytestmark = pytest.mark.slow


def test_two_process_gloo_parity():
    check = (
        pathlib.Path(__file__).resolve().parent.parent
        / "tools"
        / "multiproc_dcn_check.py"
    )
    proc = subprocess.run(
        [sys.executable, str(check)],
        capture_output=True,
        text=True,
        timeout=570,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["ok"]
    assert summary["processes"] == 2
    # both directions, every boundary, from both processes
    for pid in (0, 1):
        for boundary in ("periodic", "zero", "symmetric"):
            assert summary["checks"][f"p{pid}_fwd_{boundary}"] < 1e-5
            assert summary["checks"][f"p{pid}_inverse_{boundary}"] < 1e-5
        assert summary["checks"][f"p{pid}_dcn_bytes_per_host"] == 0
