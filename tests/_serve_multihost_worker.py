"""Worker process for the two-process multi-host SERVING smoke test.

Each worker owns 4 virtual CPU devices; jax.distributed stitches them into
one 8-device runtime (2-host pod-slice analogue).  Every host runs the same
SPMD ``synthesize()`` on the same request: the engine shards the batch axis
of its fused program over the global mesh (each host feeding its local
rows), cross-host collectives run inside the program, and outputs come back
replicated so each host hands the caller the full waveform.

Usage: python tests/_serve_multihost_worker.py <coordinator> <n_procs> <pid>
"""

import hashlib
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")

import jax

# env vars alone don't stick in this image (jax is pre-imported with the TPU
# platform registered at interpreter start); force the CPU platform first.
jax.config.update("jax_platforms", "cpu")

import numpy as np


def main(coordinator: str, num_processes: int, process_id: int) -> None:
    from e2e_tts_tpu.parallel.distributed import initialize

    multi = initialize(coordinator, num_processes, process_id)
    assert multi, "jax.distributed did not come up multi-process"
    assert jax.device_count() == 4 * num_processes

    from e2e_tts_tpu.config import default_config
    from e2e_tts_tpu.serve import SynthesisEngine

    cfg = default_config()
    fs2 = cfg.models.fastspeech2
    small = fs2.replace(
        encoder_layers=1, decoder_layers=1, encoder_hidden=64, decoder_hidden=64,
        building_block=fs2.building_block.replace(
            transformer=fs2.building_block.transformer.replace(conv_filter_size=64)
        ),
        postnet=fs2.postnet.replace(embedding_dim=64, conv_layers=2),
    )
    hifi = cfg.models.hifigan.replace(
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    cfg = cfg.replace(models=cfg.models.replace(fastspeech2=small, hifigan=hifi))

    eng = SynthesisEngine.from_random(
        seed=0, config=cfg, batch_size=4, global_mesh=True
    )
    assert eng.serve_mesh is not None
    procs_on_mesh = {d.process_index for d in eng.serve_mesh.devices.flat}
    assert len(procs_on_mesh) == num_processes, procs_on_mesh
    assert eng.batch_size % jax.device_count() == 0

    audio = eng.synthesize("xin chào việt nam hôm nay trời đẹp")
    assert audio.dtype == np.int16 and len(audio) > 1000, audio.shape
    digest = hashlib.sha256(audio.tobytes()).hexdigest()[:16]

    print(
        f"SERVE-OK pid={process_id} procs={jax.process_count()} "
        f"n={len(audio)} sha={digest}"
    )
    jax.distributed.shutdown()


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
