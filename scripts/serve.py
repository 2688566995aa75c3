"""Minimal production HTTP server for OronTTS-TPU synthesis.

POST /synthesize  {"text": "...", "lang": "mn", "steps": 32, "seed": 0,
                   "cfg_strength": 2.0, "speed": 1.0}  → audio/wav bytes
POST /synthesize_batch {"texts": [...], ...}           → multipart-free JSON
                   {"wavs_base64": [...], "sample_rate": 24000}
GET  /healthz → {"status": "ok", "model_steps": N}

Single-process, thread-pooled; the jitted sampler cache is shared across
requests so repeat bucket shapes serve at device speed. Warmup pre-compiles
the default chunk bucket at startup.
"""

import argparse
import base64
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

_model = None
_model_lock = threading.Lock()
_meta = {}


def _wav_bytes(wav, sample_rate: int) -> bytes:
    from oron_tts_tpu.data.wav import wav_bytes

    return wav_bytes(wav, sample_rate)


class Handler(BaseHTTPRequestHandler):
    def _json(self, code: int, obj) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/healthz":
            self._json(200, {"status": "ok", **_meta})
        else:
            self._json(404, {"error": "not found"})

    def do_POST(self):
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
        except (ValueError, json.JSONDecodeError):
            self._json(400, {"error": "invalid JSON body"})
            return

        try:
            common = dict(
                lang=req.get("lang", "mn"),
                n_steps=int(req.get("steps", 32)),
                cfg_strength=float(req.get("cfg_strength", 2.0)),
                sway_sampling_coef=req.get("sway_sampling_coef", -1.0),
                speed=float(req.get("speed", 1.0)),
                seed=req.get("seed"),
            )
        except (TypeError, ValueError) as exc:
            self._json(400, {"error": f"invalid parameter: {exc}"})
            return
        try:
            if self.path == "/synthesize":
                text = req.get("text")
                if not text:
                    self._json(400, {"error": "missing 'text'"})
                    return
                with _model_lock:
                    wav = _model.synthesize(text=text, **common)
                body = _wav_bytes(wav, _model.sample_rate)
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/synthesize_batch":
                texts = req.get("texts")
                if not texts or not isinstance(texts, list):
                    self._json(400, {"error": "missing 'texts' list"})
                    return
                with _model_lock:
                    wavs = _model.synthesize_batch(texts, **common)
                self._json(200, {
                    "sample_rate": _model.sample_rate,
                    "wavs_base64": [
                        base64.b64encode(
                            _wav_bytes(w, _model.sample_rate)
                        ).decode() for w in wavs
                    ],
                })
            else:
                self._json(404, {"error": "not found"})
        except ValueError as exc:
            self._json(400, {"error": str(exc)})
        except Exception as exc:  # noqa: BLE001 — keep the server alive
            self._json(500, {"error": f"{type(exc).__name__}: {exc}"})

    def log_message(self, fmt, *fmt_args):  # quieter default logging
        print(f"[serve] {self.address_string()} {fmt % fmt_args}")


def main() -> None:
    global _model
    parser = argparse.ArgumentParser(description="OronTTS-TPU HTTP server")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--vocoder", type=str, default=None)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--no-ema", action="store_true")
    parser.add_argument("--warmup", action="store_true",
                        help="Pre-compile the default chunk bucket at startup")
    parser.add_argument("--no-scan-blocks", action="store_true",
                        help="Use the unrolled DiT block loop instead of "
                             "lax.scan (identical numerics; scan compiles "
                             "~depth× faster, so it is the serving default)")
    parser.add_argument("--device", type=str, default=None)
    parser.add_argument("--mesh", type=str, default=None,
                        help="Multi-chip serving mesh as DPxTP (e.g. 2x4): "
                             "batch rows shard over DP, attention/FFN "
                             "projections over TP")
    args = parser.parse_args()

    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    from oron_tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from scripts.infer import load_model

    _model = load_model(args.checkpoint, use_ema=not args.no_ema,
                        scan_blocks=not args.no_scan_blocks)
    if args.vocoder:
        _model.load_vocoder(args.vocoder)
    if args.mesh:
        from oron_tts_tpu.parallel.mesh import make_mesh

        dp, _, tp = args.mesh.partition("x")
        mesh = make_mesh(int(dp), int(tp or 1))
        _model.set_mesh(mesh)
        _meta["mesh"] = dict(mesh.shape)
        print(f"[serve] mesh: {dict(mesh.shape)}")
    _meta["params"] = _model.num_params()
    if args.warmup:
        # warm the cache entry real requests will hit: default steps=32 on
        # the full 120-char chunk bucket (the sampler cache keys on both)
        print("[serve] warmup synthesis (compiles the default request shape)...")
        _model.synthesize("а" * 120, n_steps=32)
        print("[serve] warmup done")

    server = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"[serve] listening on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
