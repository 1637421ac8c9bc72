"""Benchmark: batched synthesis real-time factor (RTF) per chip.

Measures the full serving path (text -> phonemes -> acoustic -> vocoder ->
host int16) on the default-size models (FastSpeech2 ~35M + HiFi-GAN ~14M,
BASELINE.md) through the bucketed-jit engine, bf16 compute.

Prints ONE JSON line:
  {"metric": "batched_synthesis_rtf_per_chip", "value": <rtf>,
   "unit": "rtf", "vs_baseline": <0.01 / rtf>}

Baseline: the driver's north-star target RTF 0.01 (BASELINE.json); the
reference publishes no numbers (BASELINE.md).  vs_baseline > 1 means faster
than target.
"""

import json
import time

import jax.numpy as jnp
import numpy as np


SENTENCES = [
    "hôm nay trời đẹp chúng ta cùng nhau đi dạo quanh hồ gươm nhé",
    "việt nam là một đất nước xinh đẹp với nhiều danh lam thắng cảnh nổi tiếng",
    "công nghệ trí tuệ nhân tạo đang thay đổi cách chúng ta sống và làm việc",
    "buổi sáng tôi thường uống cà phê và đọc báo trước khi đi làm",
    "những cánh đồng lúa chín vàng trải dài đến tận chân trời xa xăm",
    "âm nhạc truyền thống việt nam mang đậm bản sắc văn hóa dân tộc",
    "trẻ em cần được học tập vui chơi và phát triển trong môi trường lành mạnh",
    "mùa thu hà nội với hương hoa sữa nồng nàn khắp các con phố nhỏ",
]


def main():
    from e2e_tts_tpu.serve import SynthesisEngine

    engine = SynthesisEngine.from_random(seed=0, dtype=jnp.bfloat16, batch_size=8)

    # warm up / compile every program the workload needs
    engine.synthesize(SENTENCES, silence_distance=0.0)

    # timed runs
    n_iters = 5
    t0 = time.perf_counter()
    total_audio_s = 0.0
    for _ in range(n_iters):
        audio = engine.synthesize(SENTENCES, silence_distance=0.0)
        total_audio_s += len(audio) / engine.sample_rate
    elapsed = time.perf_counter() - t0

    rtf = elapsed / total_audio_s
    print(
        json.dumps(
            {
                "metric": "batched_synthesis_rtf_per_chip",
                "value": round(rtf, 6),
                "unit": "rtf",
                "vs_baseline": round(0.01 / rtf, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
