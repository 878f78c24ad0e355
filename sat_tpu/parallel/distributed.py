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


def _cluster_env_present() -> bool:
    """True when jax's own cluster auto-detection would find a managed
    environment (SLURM / OpenMPI / GCE- or GKE-TPU pod slice / K8s jobset).

    None of these set the env vars the explicit hint check looks at — a
    plain GCE multi-host TPU slice advertises itself only through the
    metadata server (review r4: the hint-only guard silently skipped
    distributed init there, leaving every host training an independent
    duplicate on the full dataset). Probing jax's detector classes keeps
    this module's guard and jax.distributed.initialize's own detection in
    agreement. Private-API probe, so any failure degrades to the
    hint-only behavior rather than breaking single-host startup."""
    try:
        from jax._src import clusters
        return any(c.is_env_present()
                   for c in clusters.ClusterEnv._cluster_types)
    except Exception:
        return False


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
        if not coord_hinted and not multi_worker \
                and not _cluster_env_present():
            return  # single host — nothing to do
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError) as e:
        # Already initialized, or single-process environment.
        if "already" not in str(e).lower():
            raise
