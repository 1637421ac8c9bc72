"""Multi-host (multi-process) training setup.

The reference has no distribution at all (SURVEY.md §2.10).  Here multi-host
runs use jax.distributed: every host calls :func:`initialize` first, after
which ``jax.devices()`` spans the whole slice and the existing mesh/sharding
code (mesh.py, sharding.py) works unchanged — batch arrays must simply be
created per-host with ``host_local_batch`` shapes.

Single-host (the common case, and this environment) is a no-op.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or the standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, or cloud-TPU
    auto-detection).  Returns True when a multi-process runtime came up.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    num_processes = num_processes or _int_env("NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("PROCESS_ID")

    if coordinator_address is None and num_processes is None:
        # single host, or cloud TPU with auto-detection available
        try:
            jax.distributed.initialize()
        except Exception as exc:
            # On a plain single host this raise is the normal path; on a
            # pod slice a swallowed transient coordinator error would
            # silently degrade to N independent hosts — surface it so a
            # misconfigured multi-host job is at least diagnosable.
            import logging

            logging.getLogger(__name__).info(
                "jax.distributed auto-initialize unavailable (%s); "
                "continuing single-process", exc,
            )
            return False
        return jax.process_count() > 1

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def host_local_batch(global_batch: int) -> int:
    """Per-host batch size for a globally-sharded batch."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    return global_batch // n


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v else None
