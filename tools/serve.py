"""Serve a trained SLU model over HTTP with device micro-batching.

Run: python tools/serve.py --config_path=experiments/X.cfg [--port 8600]
     [--max-batch 8] [--batch-window-ms 5] [--no-warmup]

POST /decode with a 16 kHz WAV body -> {"intents": [...], "ms": N}
GET  /healthz                      -> {"ok": true}

Uses the length-exact batched decode path (tpu_slu/serving.py): concurrent
requests share one compiled device call per 0.5 s bucket with bit-identical
results to per-request decodes.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8600)
    parser.add_argument("--max-batch", type=int, default=8)
    parser.add_argument("--batch-window-ms", type=float, default=5.0)
    parser.add_argument("--max-seconds", type=float, default=16.0)
    parser.add_argument("--no-warmup", action="store_true")
    args = parser.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )

    import tpu_slu
    from tpu_slu.serving import IntentServer, load_trained_model, make_http_server

    config = tpu_slu.read_config(args.config_path, make_dirs=False)
    model = load_trained_model(config)
    server = IntentServer(
        model,
        max_batch=args.max_batch,
        batch_window_ms=args.batch_window_ms,
        max_seconds=args.max_seconds,
    )
    # Bind before warmup: early clients queue in the TCP backlog instead of
    # getting connection-refused while the bucket shapes compile.
    httpd = make_http_server(server, args.host, args.port)
    if not args.no_warmup:
        print("warming up compiled bucket shapes ...")
        server.warmup()
    print(f"serving on http://{args.host}:{httpd.server_address[1]} "
          f"(max_batch={args.max_batch}, window={args.batch_window_ms} ms)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.close()


if __name__ == "__main__":
    main()
