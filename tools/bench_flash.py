"""Measure the Pallas flash attention vs plain XLA attention on TPU at the
long-context shapes the decoder sees (T = 256 / 512 / 1024 mel frames).

ROADMAP "measure flash at T=512/1024".  Prints one JSON line per shape with
forward and forward+backward timings and the speedup.  Run on the real chip:

    python tools/bench_flash.py
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
    for T in (256, 512, 1024):
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(BH, T, D), jnp.bfloat16)
        k = jnp.asarray(rng.randn(BH, T, D), jnp.bfloat16)
        v = jnp.asarray(rng.randn(BH, T, D), jnp.bfloat16)
        lens = jnp.asarray(rng.randint(T // 2, T + 1, BH), jnp.int32)

        flash_fwd = jax.jit(lambda *a: flash_attention(*a, interpret=interpret))
        xla_fwd = jax.jit(attention_reference)
        t_flash = _time(lambda q, k, v, l: flash_fwd(q, k, v, l), q, k, v, lens)
        t_xla = _time(lambda q, k, v, l: xla_fwd(q, k, v, l), q, k, v, lens)

        def loss_flash(q, k, v, lens):
            return flash_attention(q, k, v, lens, interpret=interpret).sum()

        def loss_xla(q, k, v, lens):
            return attention_reference(q, k, v, lens).sum()

        g_flash = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))
        g_xla = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))
        t_flash_bwd = _time(g_flash, q, k, v, lens)
        t_xla_bwd = _time(g_xla, q, k, v, lens)

        row = {
            "T": T,
            "fwd_flash_ms": round(t_flash * 1e3, 3),
            "fwd_xla_ms": round(t_xla * 1e3, 3),
            "fwd_speedup": round(t_xla / t_flash, 2),
            "bwd_flash_ms": round(t_flash_bwd * 1e3, 3),
            "bwd_xla_ms": round(t_xla_bwd * 1e3, 3),
            "bwd_speedup": round(t_xla_bwd / t_flash_bwd, 2),
        }
        rows.append(row)
        print(json.dumps(row))
    return rows


if __name__ == "__main__":
    main()
