"""Multi-host startup helper.

UX analog of the reference's `--serve_rpc` / `--rpc_endpoints`
(SURVEY.md §2.7 P2, §5.8): instead of starting one RPC server per remote
device and registering endpoints, every host runs the SAME program with a
coordinator address; jax.distributed wires the pod and the mesh spans all
hosts' devices, with XLA collectives over ICI/DCN replacing the TCP hop.

    # host 0                                   # host 1
    python app.py --coordinator h0:9999 \\      python app.py --coordinator h0:9999 \\
        --num_processes 2 --process_id 0           --num_processes 2 --process_id 1
"""
from __future__ import annotations

import jax


def init_distributed(coordinator: str, num_processes: int, process_id: int,
                     local_device_ids=None):
    """Initialize multi-process JAX (the --serve_rpc/--rpc_endpoints analog)."""
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": [str(d) for d in jax.local_devices()],
        "global_devices": len(jax.devices()),
    }


def global_mesh(tp: int = -1, dp: int = 1):
    """Mesh over ALL hosts' devices (call after init_distributed)."""
    from .mesh import make_mesh

    return make_mesh(tp=tp, dp=dp, devices=jax.devices())
