"""Multi-host (multi-process) runtime glue for TPU pods.

The reference is single-process (SURVEY.md §2.5); this framework's
multi-chip design is single-controller JAX: every host runs the same
program, ``jax.distributed.initialize`` wires the hosts into one global
device mesh, and from then on the mesh/pjit machinery (``parallel.mesh``,
``fit(mesh=...)``) is host-count-agnostic — ``fit`` already feeds each
process only its own data shard (``NativeLoader(shard=...)`` +
``jax.make_array_from_process_local_data``).

This module is the thin, explicit seam for the pod launcher:

    from tensor_ops_tpu.parallel.distributed import init_distributed
    init_distributed()              # env-driven (TPU pods: all defaults)
    mesh = make_mesh(len(jax.devices()))   # GLOBAL device count
    fit(net, loss, be, X, Y, mesh=mesh, ...)

On Cloud TPU pods ``initialize()`` with no arguments discovers the
coordinator and process topology from the TPU metadata; elsewhere pass
``coordinator_address``/``num_processes``/``process_id`` explicitly or
via the TOPS_COORDINATOR / TOPS_NUM_PROCESSES / TOPS_PROCESS_ID
environment variables.
"""

from __future__ import annotations

import os
from typing import Optional

_initialized = False


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> dict:
    """Initialize the multi-process JAX runtime (idempotent).

    Argument resolution order: explicit args > TOPS_* env vars > JAX's
    own auto-discovery (TPU pod metadata).  Single-process runs (no
    coordinator configured anywhere) are a no-op.  Returns a summary
    dict: {initialized, process_index, process_count, local_devices,
    global_devices}.
    """
    global _initialized
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "TOPS_COORDINATOR")
    if num_processes is None and "TOPS_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["TOPS_NUM_PROCESSES"])
    if process_id is None and "TOPS_PROCESS_ID" in os.environ:
        process_id = int(os.environ["TOPS_PROCESS_ID"])

    explicit = coordinator_address is not None
    on_pod = os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS")
    if on_pod and not explicit:
        # auto-discovery only works BEFORE the XLA backend exists; a
        # single-host session that already touched jax (or an axon-style
        # tunnel env that fakes pod markers) must stay single-process
        try:
            from jax._src import xla_bridge as _xb

            if _xb.backends_are_initialized():
                on_pod = False
        except Exception:
            pass
    if not _initialized and (explicit or on_pod):
        kwargs = {}
        if explicit:
            kwargs = dict(coordinator_address=coordinator_address,
                          num_processes=num_processes,
                          process_id=process_id)
        jax.distributed.initialize(**kwargs)
        _initialized = True

    return {
        "initialized": _initialized,
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def shutdown_distributed() -> None:
    """Tear down the distributed client (end-of-program hygiene)."""
    global _initialized
    if _initialized:
        import jax

        jax.distributed.shutdown()
        _initialized = False
