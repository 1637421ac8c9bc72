"""Measure the Pallas flash-attention FORWARD vs plain XLA attention on TPU
at the long-context shapes the decoder sees (T = 256..2048 mel frames).

Round-5 verdict (assets/bench/flash_attention_v5e.json): XLA won at every
shape (fwd 0.37-0.67x, bwd 0.53-0.79x for the hand kernel), so the backward
kernels were DELETED and this script now benchmarks only the surviving
forward path.  Re-run it if the hardware generation changes:

    python tools/bench_flash.py [T ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _time(fn, q, *args, iters=100):
    """Per-iteration time with the iterations CHAINED on device (the output
    feeds the next input), so async dispatch / tunnel latency can't hide
    compute and the measurement is one program with iters serialized steps."""
    import jax

    @jax.jit
    def chained(q, *a):
        def body(_, acc):
            out = fn(acc, *a)
            if isinstance(out, tuple):  # grad tuples: chain on dq
                out = out[0]
            # keep shape: fold the output back into a q-shaped carry
            return acc + 1e-6 * out.reshape(acc.shape).astype(acc.dtype)

        return jax.lax.fori_loop(0, iters, body, q)

    # NOTE: block_until_ready on the remote 'axon' platform can return
    # before execution completes; a scalar D2H fetch is the reliable sync.
    float(chained(q, *args).sum())  # compile + sync
    t0 = time.perf_counter()
    float(chained(q, *args).sum())
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from e2e_tts_tpu.kernels.flash_attention import (
        attention_reference,
        flash_attention,
    )

    interpret = jax.default_backend() != "tpu"
    B, H, D = 16, 2, 128  # decoder serving shape: batch 16, 2 heads, d=256
    BH = B * H
    rows = []
    shapes = tuple(int(a) for a in sys.argv[1:]) or (256, 512, 1024, 2048)
    for T in shapes:
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(BH, T, D), jnp.bfloat16)
        k = jnp.asarray(rng.randn(BH, T, D), jnp.bfloat16)
        v = jnp.asarray(rng.randn(BH, T, D), jnp.bfloat16)
        lens = jnp.asarray(rng.randint(T // 2, T + 1, BH), jnp.int32)

        flash_fwd = jax.jit(lambda *a: flash_attention(*a, interpret=interpret))
        xla_fwd = jax.jit(attention_reference)
        t_flash = _time(lambda q, k, v, l: flash_fwd(q, k, v, l), q, k, v, lens)
        t_xla = _time(lambda q, k, v, l: xla_fwd(q, k, v, l), q, k, v, lens)

        row = {
            "T": T,
            "fwd_flash_ms": round(t_flash * 1e3, 3),
            "fwd_xla_ms": round(t_xla * 1e3, 3),
            "fwd_speedup": round(t_xla / t_flash, 2),
        }
        rows.append(row)
        print(json.dumps(row))
    return rows


if __name__ == "__main__":
    main()
