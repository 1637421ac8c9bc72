"""Worker process for the two-process jax.distributed smoke test.

Each worker owns 4 virtual CPU devices; jax.distributed stitches them into
one 8-device global runtime (the TPU-world analogue of a 2-host slice over
DCN).  The worker initializes parallel/distributed.py, builds the global
(data, model) mesh, assembles a process-local shard of a global batch, and
runs one jitted acoustic train step whose gradient reduction crosses the
process boundary.

Usage: python tests/_distributed_worker.py <coordinator> <n_procs> <pid>
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")

import jax

# env vars alone don't stick in this image (jax is pre-imported with the TPU
# platform registered at interpreter start); force the CPU platform first.
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main(coordinator: str, num_processes: int, process_id: int) -> None:
    from e2e_tts_tpu.parallel.distributed import (
        host_local_batch,
        initialize,
        is_primary,
    )

    multi = initialize(coordinator, num_processes, process_id)
    assert multi, "jax.distributed did not come up multi-process"
    assert jax.process_count() == num_processes, jax.process_count()
    assert jax.device_count() == 4 * num_processes, jax.device_count()
    assert jax.local_device_count() == 4
    assert is_primary() == (process_id == 0)

    from e2e_tts_tpu.config import default_config
    from e2e_tts_tpu.models.acoustic import FastSpeech2
    from e2e_tts_tpu.nn.variance import FeatureStats
    from e2e_tts_tpu.parallel import batch_sharding, make_mesh, param_sharding_rules
    from e2e_tts_tpu.text import symbols
    from e2e_tts_tpu.train import (
        AcousticBatch,
        acoustic_optimizer,
        init_train_state,
        make_train_step,
    )

    cfg = default_config()
    fs2 = cfg.models.fastspeech2
    small = fs2.replace(
        encoder_layers=1, decoder_layers=1, encoder_hidden=64, decoder_hidden=64,
        building_block=fs2.building_block.replace(
            transformer=fs2.building_block.transformer.replace(conv_filter_size=64)
        ),
        postnet=fs2.postnet.replace(embedding_dim=64, conv_layers=2),
    )
    cfg = cfg.replace(models=cfg.models.replace(fastspeech2=small))

    mesh = make_mesh(jax.device_count(), model_parallel=2)
    model = FastSpeech2(
        config=cfg.models.fastspeech2,
        n_symbols=len(symbols),
        n_speakers=2,
        n_mel_channels=cfg.audio.mel.channels,
        stats=FeatureStats(),
    )
    optimizer = acoustic_optimizer(
        cfg.train.fastspeech2_optimizer, cfg.models.fastspeech2.encoder_hidden
    )
    train_step = make_train_step(model, cfg, optimizer, n_words=4)
    state = init_train_state(model, optimizer, jax.random.PRNGKey(0))
    state = state._replace(
        params=jax.device_put(state.params, param_sharding_rules(state.params, mesh))
    )

    # global batch assembled from per-process shards: each process creates
    # only its host-local rows, make_array_from_process_local_data globalizes
    GB, L, T = 8, 8, 24
    lb = host_local_batch(GB)
    assert lb == GB // num_processes
    rng = np.random.RandomState(42)  # same stream; rows sliced per process
    full = {
        "speakers": np.zeros((GB,), np.int32),
        "texts": rng.randint(4, len(symbols), (GB, L)).astype(np.int32),
        "txt_lens": np.full((GB,), L, np.int32),
        "word_ids": np.minimum(np.arange(L) // 2, 3)[None].repeat(GB, 0),
        "mel": rng.randn(GB, T, 80).astype(np.float32),
        "mel_lens": np.full((GB,), T, np.int32),
        "attn_prior": np.full((GB, T, L), 1.0 / L, np.float32),
        "duration_target": np.zeros((GB, L), np.float32),
        "f0": rng.randn(GB, T).astype(np.float32),
        "uv": (rng.rand(GB, T) > 0.7).astype(np.float32),
        "pitch": rng.randn(GB, T).astype(np.float32),
        "energy": np.abs(rng.randn(GB, T)).astype(np.float32),
    }
    data_sh = batch_sharding(mesh)
    lo = process_id * lb
    batch = AcousticBatch(
        **{
            k: jax.make_array_from_process_local_data(
                data_sh, v[lo : lo + lb], v.shape
            )
            for k, v in full.items()
        }
    )

    with mesh:
        new_state, metrics = jax.jit(train_step)(state, batch, jax.random.PRNGKey(1))
        total = float(metrics["total"])

    assert np.isfinite(total), total
    print(f"DIST-OK pid={process_id} procs={jax.process_count()} loss={total:.4f}")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
