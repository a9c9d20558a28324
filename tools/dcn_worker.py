"""Worker for the true multi-process DCN validation (see multiproc_dcn_check.py).

Each process owns one mesh host row (4 virtual CPU devices) and its own
batch rows; collectives between processes run over the Gloo transport —
the CPU stand-in for DCN/ICI.  Prints one JSON line with the max parity
deviation per check.

Usage: python tools/dcn_worker.py <process_id> <num_processes> <port>
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", num_processes=nproc, process_id=pid)

import numpy as np
import jax.numpy as jnp

import vectorwave_tpu as vw
from vectorwave_tpu.parallel import (
    communication_report,
    imodwt_multilevel_multihost,
    make_multihost_mesh,
    modwt_multilevel_multihost,
)


def shard_dev(global_leaf, local_ref, row_offset):
    """Max |shard - reference| over this process's addressable shards."""
    dev = 0.0
    for shard in global_leaf.addressable_shards:
        idx = list(shard.index)
        rows = idx[0]
        local_rows = slice(
            (rows.start or 0) - row_offset,
            (rows.stop if rows.stop is not None else None)
            and rows.stop - row_offset,
        )
        ref_block = local_ref[(local_rows, *idx[1:])]
        dev = max(dev, float(np.max(np.abs(np.asarray(shard.data) - ref_block))))
    return dev


def main() -> None:
    mesh = make_multihost_mesh()  # inferred from the attached processes
    assert mesh.shape == {"host": nproc, "chip": 4}, mesh.shape

    local_batch, n, levels = 3, 1024, 4
    rng = np.random.default_rng(100 + pid)  # different rows per host
    x_local = rng.standard_normal((local_batch, n)).astype(np.float32)
    row_offset = pid * local_batch

    checks = {}
    for boundary in ("periodic", "zero", "symmetric"):
        res = modwt_multilevel_multihost(
            x_local, "db4", levels=levels, mesh=mesh, boundary=boundary
        )
        ref = vw.modwt_multilevel(
            jnp.asarray(x_local), "db4", levels=levels, boundary=boundary,
            backend="jnp",
        )
        fwd = max(
            max(
                shard_dev(d, np.asarray(r), row_offset)
                for d, r in zip(res.details, ref.details)
            ),
            shard_dev(res.approx, np.asarray(ref.approx), row_offset),
        )
        x_rec = imodwt_multilevel_multihost(
            res, "db4", mesh=mesh, boundary=boundary
        )
        # distributed-vs-sequential inverse parity (zero/symmetric round
        # trips are approximate at the edges BY DESIGN, so the oracle is the
        # single-device inverse, not x itself)
        xr_ref = np.asarray(
            vw.imodwt_multilevel(ref, "db4", boundary=boundary, backend="jnp")
        )
        inv = shard_dev(x_rec, xr_ref, row_offset)
        checks[f"fwd_{boundary}"] = fwd
        checks[f"inverse_{boundary}"] = inv
        if boundary == "periodic":
            checks["roundtrip_periodic"] = shard_dev(x_rec, x_local, row_offset)

    report = communication_report(
        mesh, "db4", levels=levels, n=n, batch=local_batch * nproc
    )
    checks["dcn_bytes_per_host"] = report.dcn_bytes_per_host

    print("RESULT " + json.dumps({"pid": pid, **checks}), flush=True)


if __name__ == "__main__":
    main()
