"""Multi-host initialization.

The reference is strictly single-process/single-device (hardcoded MPS
device, reference train.py:34-35). Here, multi-host TPU slices follow the
standard JAX recipe: call `initialize()` once at process start (before any
backend use); `jax.devices()` then spans the slice, the engine's mesh covers
all global devices, the BatchLoader stripes input by
`jax.process_index()/process_count()`, and XLA routes gradient collectives
over ICI within a slice and DCN across slices — no NCCL/MPI-style user code.

On single-host (including this dev pod's tunneled single chip) it is a
no-op, so every entry point can call it unconditionally.
"""

from __future__ import annotations

import os


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed when running multi-process.

    With no arguments, relies on the TPU environment's auto-bootstrapping
    (GCE metadata / megascale env vars); arguments override for manual
    setups. Safe to call on single-host: if no cluster environment is
    detected and no arguments are given, it does nothing.
    """
    import jax

    if coordinator_address is None and num_processes is None:
        # Initialize only when some cluster environment hint is present; a
        # TPU_WORKER_HOSTNAMES of "localhost" alone (this dev pod) is not a
        # cluster.
        coord_hinted = any(os.environ.get(k) for k in
                           ("COORDINATOR_ADDRESS",
                            "MEGASCALE_COORDINATOR_ADDRESS"))
        workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        multi_worker = workers not in ("", "localhost") and "," in workers
        if not coord_hinted and not multi_worker:
            return  # single host — nothing to do
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError) as e:
        # Already initialized, or single-process environment.
        if "already" not in str(e).lower():
            raise
