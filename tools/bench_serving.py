"""Measure the serving stack under load on the real chip (VERDICT r3 #6).

Drives ``tpu_slu.serving.IntentServer`` (the engine behind ``tools/serve.py``)
in-process — same micro-batcher, same length-exact bucketed decode, minus the
HTTP framing — and records the numbers that previously lived only in README
prose:

* warm single-request latency (p50/p99 over N serial decodes)
* the micro-batching win: C concurrent clients vs the same C requests
  serial, total wall + effective throughput

The model is freshly initialized (weights don't affect timing; the decode
path, bucket shapes, and compiled executables are identical to a trained
checkpoint's). Writes the JSON artifact to --out (committed as
experiments/serving_v5e.json) and prints it.

Run: python tools/bench_serving.py [--requests 50] [--concurrency 8]
"""

import argparse
import concurrent.futures as cf
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--requests", type=int, default=50)
    parser.add_argument("--concurrency", type=int, default=8)
    parser.add_argument("--seconds", type=float, default=2.3)
    parser.add_argument("--out", default="")
    args = parser.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )

    import __graft_entry__
    from tpu_slu.models.slu import Model
    from tpu_slu.serving import IntentServer

    config = __graft_entry__._make_config(tempfile.mkdtemp(), small=False)
    model = Model(config)
    server = IntentServer(model, max_batch=args.concurrency, batch_window_ms=5.0)
    rng = np.random.default_rng(0)
    wavs = [
        rng.standard_normal(int(16000 * args.seconds * (0.7 + 0.6 * i / 16)))
        .astype(np.float32)
        for i in range(16)
    ]

    t0 = time.time()
    server.warmup()
    # also warm every bucket shape this workload's lengths map to (plus the
    # batched variants the micro-batcher forms) — warm latency means the
    # executables for the serving bucket set exist, exactly as a production
    # deployment pre-warms its buckets; first-hit remote compiles otherwise
    # read as multi-second p99 outliers
    for w in wavs:
        server.decode(w)
    with cf.ThreadPoolExecutor(max_workers=args.concurrency) as pool:
        for i in range(0, len(wavs), args.concurrency):
            list(pool.map(server.decode, wavs[i:i + args.concurrency]))
    warmup_s = time.time() - t0
    print(f"warmup: {warmup_s:.1f}s", flush=True)

    # warm serial latency
    lat = []
    for i in range(args.requests):
        t0 = time.time()
        server.decode(wavs[i % len(wavs)])
        lat.append((time.time() - t0) * 1000)
    p50 = float(np.percentile(lat, 50))
    p99 = float(np.percentile(lat, 99))
    print(f"serial warm latency: p50 {p50:.1f} ms, p99 {p99:.1f} ms", flush=True)

    # micro-batching win: C concurrent vs C serial, repeated rounds
    C = args.concurrency
    conc_walls, serial_walls = [], []
    with cf.ThreadPoolExecutor(max_workers=C) as pool:
        for r in range(6):
            t0 = time.time()
            futs = [pool.submit(server.decode, wavs[(r * C + i) % len(wavs)])
                    for i in range(C)]
            for f in futs:
                f.result()
            conc_walls.append(time.time() - t0)
            t0 = time.time()
            for i in range(C):
                server.decode(wavs[(r * C + i) % len(wavs)])
            serial_walls.append(time.time() - t0)
    conc_s = float(np.median(conc_walls))
    ser_s = float(np.median(serial_walls))
    out = {
        "device": str(jax.devices()[0]),
        "max_batch": C,
        "batch_window_ms": 5.0,
        "warmup_s": round(warmup_s, 1),
        "serial_p50_ms": round(p50, 1),
        "serial_p99_ms": round(p99, 1),
        f"concurrent_{C}_wall_s": round(conc_s, 3),
        f"serial_{C}_wall_s": round(ser_s, 3),
        "microbatch_speedup": round(ser_s / conc_s, 2),
        "concurrent_req_per_s": round(C / conc_s, 1),
    }
    server.close()
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
