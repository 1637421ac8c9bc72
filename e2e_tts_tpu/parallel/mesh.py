"""Device-mesh construction.

The reference has no distribution layer at all (SURVEY.md §2.10); scaling
here is designed mesh-first: a 2-D (data, model) mesh over ICI, with batch
sharded on "data" (DP) and wide weight matrices sharded on "model" (TP).
For TTS-scale models DP dominates; the model axis exists so attention heads
and FFN/vocoder channels can shard when serving wide batches or training
larger variants.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    axis_names: Sequence[str] = ("data", "model"),
) -> Mesh:
    """Build a (data, model) mesh over the first n_devices devices.

    model_parallel must divide n_devices; data = n_devices // model_parallel.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"asked for {n} devices, have {len(devices)}")
    if n % model_parallel:
        raise ValueError(f"model_parallel={model_parallel} must divide {n}")
    grid = np.asarray(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names)


def make_data_mesh(batch_size: int, model_parallel: int = 1) -> Mesh:
    """Mesh whose data axis divides ``batch_size`` (shrinks to fit)."""
    avail = len(jax.devices()) // model_parallel
    n_data = max(
        (d for d in range(1, avail + 1) if batch_size % d == 0), default=1
    )
    return make_mesh(n_data * model_parallel, model_parallel=model_parallel)
