"""Minimal production HTTP server for OronTTS-TPU synthesis.

POST /synthesize  {"text": "...", "lang": "mn", "steps": 32, "seed": 0,
                   "cfg_strength": 2.0, "speed": 1.0}  → audio/wav bytes
                  Voice cloning: add "ref_audio_b64" (base64 WAV) or
                  "ref_audio_path" (server-local file) + "ref_text" —
                  works on all three synthesis endpoints; /synthesize_batch
                  clones one voice across the whole batch.
POST /synthesize_stream  same body → chunked audio/wav: WAV header first,
                   then PCM16 pieces as each text chunk's solve drains
                   (time-to-first-audio ≈ one chunk group's solve)
POST /synthesize_batch {"texts": [...], ...}           → multipart-free JSON
                   {"wavs_base64": [...], "sample_rate": 24000}
GET  /healthz → {"status": "ok", "merged_batches": N, "params": N,
                 "requests": N (served total, all synthesis endpoints),
                 "latency_p50_ms": x, "latency_p95_ms": x (rolling
                 512-request window) [, "mesh"]}

Single-process, thread-pooled. Concurrent /synthesize requests are merged
by a micro-batcher: requests with identical solver parameters that arrive
while the device is busy ride ONE length-grouped CFG Euler solve
(F5TTS.synthesize_batch). Per-request PRNG seeds make each merged
request's audio identical to its solo synthesis (the determinism contract
in models/f5tts.py), so batching changes latency, never outputs. Warmup
pre-compiles the default chunk bucket at startup.
"""

import argparse
import base64
import json
import threading
import time
from collections import deque
from contextlib import contextmanager
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Sequence

_model = None
_model_lock = threading.Lock()
_batcher = None
_meta = {}
# optional bearer-token auth (--auth-token / ORON_SERVE_TOKEN): when set,
# every synthesis endpoint requires "Authorization: Bearer <token>";
# /healthz stays open for load-balancer probes
_auth_token: str | None = None
# per-request ceiling on waiting for device work (--request-timeout).
# A solve already running on the chip cannot be interrupted — the timeout
# bounds how long a request WAITS (batcher queue / model lock), so a
# wedged device turns into fast 503/504s instead of unbounded pileup
_request_timeout_s: float = 120.0
# SIGTERM drain flag: /healthz flips to 503 "draining" so orchestrators
# stop routing here while in-flight requests finish
_draining = False
# --profile fast: server-side sampler defaults applied when a request
# does not set the parameter itself (a request override always wins)
_profile_defaults: dict = {}


class RequestTimeout(Exception):
    """Waiting for device work exceeded --request-timeout."""


class Overloaded(Exception):
    """Admission control: the queue's projected wait exceeds the request
    timeout, so the request is shed NOW (429 + Retry-After) instead of
    queueing toward a certain 504 that still burns a device solve.

    ``retry_after_s`` is the projected time for the backlog ahead of this
    request to clear."""

    def __init__(self, msg: str, retry_after_s: float) -> None:
        super().__init__(msg)
        self.retry_after_s = retry_after_s
# rolling per-request wall-time window over ALL synthesis endpoints + a
# monotonic served-request counter; /healthz reports p50/p95 + totals so a
# deploy can watch serving health without external instrumentation.
# _stats_lock guards BOTH the counter and the deque: /healthz iterates the
# deque (sorted), and CPython raises "deque mutated during iteration" if a
# handler thread appends concurrently — appends alone being GIL-atomic is
# not enough for the read side.
_latencies_s: deque = deque(maxlen=512)
_stats_lock = threading.Lock()
_requests_total = 0


def _record_latency(t0: float) -> None:
    global _requests_total
    with _stats_lock:
        _latencies_s.append(time.perf_counter() - t0)
        _requests_total += 1


def _wav_bytes(wav, sample_rate: int) -> bytes:
    from oron_tts_tpu.data.wav import wav_bytes

    return wav_bytes(wav, sample_rate)


class _Request:
    __slots__ = ("text", "seed", "done", "result", "error", "abandoned",
                 "taken")

    def __init__(self, text: str, seed: int) -> None:
        self.text = text
        self.seed = seed
        self.done = threading.Event()
        self.result = None
        self.error = None
        # set when the submitting handler already 504ed: the dispatcher
        # drops abandoned entries instead of burning a device solve on
        # audio nobody will receive (round-4 advisor)
        self.abandoned = False
        # set (under the batcher's _cv) when the dispatcher pops the
        # request; disambiguates who owns the _queued decrement when a
        # timeout races the dispatcher
        self.taken = False


class MicroBatcher:
    """Cross-request dynamic batching for single-chunk /synthesize.

    Requests enqueue under a parameter key (lang, steps, cfg, sway, speed);
    a dispatcher thread drains everything compatible that queued up while
    the previous solve ran and issues one synthesize_batch with per-request
    seeds. Under no load a request runs alone (no artificial delay beyond
    ``window_s``, which lets near-simultaneous arrivals coalesce).
    """

    def __init__(self, model, max_batch: int = 16,
                 window_s: float = 0.003, max_queue: int = 64) -> None:
        self._model = model
        self._max_batch = max_batch
        self._window_s = window_s
        self._max_queue = max_queue
        self._cv = threading.Condition()
        self._queues: dict[tuple, list[_Request]] = {}
        self._queued = 0  # requests currently waiting (incl. abandoned)
        # EWMA of one batched solve's wall time; drives the projected-
        # wait admission estimate. Seeded CONSERVATIVELY at a full
        # merged-batch Base solve (~2 s): the shed-demo measurement
        # (SERVE_LOAD_shed.json) showed a low prior admits the first
        # overload wave into certain 504s before the EWMA converges
        self._solve_ewma_s = 2.0
        self.merged_batches = 0  # telemetry: batches serving >1 request
        self.shed_requests = 0   # telemetry: admissions refused (429)
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _solves_ahead_locked(self) -> int:
        """Batched solves needed to clear the current backlog (hold _cv).

        Counted PER parameter key: requests only batch with same-key
        neighbors, so 64 requests across 8 keys need 8+ solves, not 4
        (a single ceil(total/max_batch) underestimates heterogeneous
        traffic and admits requests toward a certain 504). Abandoned
        (already-504ed) entries are excluded — the dispatcher drops them
        without solving, so they represent no future wait."""
        total = 0
        for reqs in self._queues.values():
            n = sum(1 for r in reqs if not r.abandoned)
            total += (n + self._max_batch - 1) // self._max_batch
        return total

    def projected_wait_s(self, solves_ahead: int | None = None) -> float:
        """Projected QUEUE WAIT for a new request: per-key solves ahead
        of it times the EWMA solve time. Deliberately excludes the
        request's OWN solve — --request-timeout bounds waiting, not
        device work, so an idle server always admits even when one solve
        exceeds the timeout."""
        if solves_ahead is None:
            with self._cv:
                solves_ahead = self._solves_ahead_locked()
        return solves_ahead * self._solve_ewma_s

    def submit(self, text: str, seed: int, params: dict) -> "object":
        req = _Request(text, seed)
        with self._cv:
            # admission control: refuse early when the backlog's projected
            # wait already exceeds the request timeout (the request would
            # 504 anyway) or the queue is at its hard cap — 429 +
            # Retry-After beats queueing toward a certain timeout
            projected = self.projected_wait_s(self._solves_ahead_locked())
            if self._queued >= self._max_queue or \
                    projected > _request_timeout_s:
                self.shed_requests += 1
                raise Overloaded(
                    f"server overloaded: {self._queued} requests queued, "
                    f"projected wait {projected:.1f}s exceeds the "
                    f"{_request_timeout_s:.0f}s request timeout",
                    retry_after_s=projected,
                )
            self._queues.setdefault(_freeze(params), []).append(req)
            self._queued += 1
            self._cv.notify()
        if not req.done.wait(timeout=_request_timeout_s):
            # the client gets a bounded 504; flagging the entry lets the
            # dispatcher drop it instead of solving for a gone client.
            # It also stops counting toward the admission backlog
            with self._cv:
                req.abandoned = True
                if not req.taken:
                    self._queued -= 1
            raise RequestTimeout(
                f"request timed out after {_request_timeout_s:.0f}s in the "
                "synthesis queue"
            )
        if req.error is not None:
            raise req.error
        return req.result

    def _take_batch(self):
        """Pop up to max_batch requests sharing one parameter key.

        Served/empty keys are DELETED (not left as empty lists): the dict
        never grows with stale client-controlled parameter combos, and a
        drained key re-inserts at the end on its next request, so iteration
        order rotates across keys instead of starving later ones."""
        for key in list(self._queues):
            # drop abandoned (already-504ed) entries BEFORE slicing: they
            # must not consume max_batch slots, or under sustained
            # overload a head full of timed-out entries starves live
            # requests behind it for extra window cycles
            reqs = [r for r in self._queues[key] if not r.abandoned]
            for r in self._queues[key]:
                r.taken = r.taken or r.abandoned
            batch, rest = reqs[: self._max_batch], reqs[self._max_batch:]
            # always delete THEN re-insert leftovers: reassigning an
            # existing dict key keeps its insertion position, so a key
            # with a backlog over max_batch would stay first and starve
            # every other parameter key
            del self._queues[key]
            if rest:
                self._queues[key] = rest
            for r in batch:
                r.taken = True
            # abandoned entries already left the backlog count when their
            # submit timed out (they no longer represent future wait)
            self._queued -= sum(1 for r in batch if not r.abandoned)
            if batch:
                return key, batch
        return None, None

    def _loop(self) -> None:
        import time

        while True:
            with self._cv:
                while not any(self._queues.values()):
                    self._cv.wait()
            time.sleep(self._window_s)  # let near-simultaneous arrivals land
            with self._cv:
                key, batch = self._take_batch()
            if not batch:
                continue
            # drop entries whose handler already sent its 504: solving
            # them would burn device time on audio nobody receives, and
            # under sustained overload that feedback loop keeps the
            # server saturated forever (round-4 advisor)
            batch = [r for r in batch if not r.abandoned]
            if not batch:
                continue
            params = dict(key)
            try:
                with _model_lock:
                    # time from INSIDE the lock: the EWMA feeds the
                    # projected-wait estimate and must measure one solve,
                    # not lock contention (counting wait time would
                    # inflate projections and spuriously shed)
                    t_solve = time.perf_counter()
                    wavs = self._model.synthesize_batch(
                        [r.text for r in batch],
                        seeds=[r.seed for r in batch],
                        **params,
                    )
                    dt = time.perf_counter() - t_solve
                self._solve_ewma_s += 0.3 * (dt - self._solve_ewma_s)
                if len(batch) > 1:
                    self.merged_batches += 1
                for r, w in zip(batch, wavs):
                    r.result = w
            except Exception as exc:  # noqa: BLE001 — isolate, don't poison the loop
                if len(batch) == 1:
                    batch[0].error = exc
                else:
                    # one bad request (e.g. whitespace-only text) must not
                    # fail its co-batched neighbors: retry each alone
                    for r in batch:
                        try:
                            with _model_lock:
                                r.result = self._model.synthesize(
                                    text=r.text, seed=r.seed, **params,
                                )
                        except Exception as solo_exc:  # noqa: BLE001
                            r.error = solo_exc
            for r in batch:
                r.done.set()


def _freeze(d: dict) -> tuple:
    return tuple(sorted(d.items()))


@contextmanager
def _model_lock_bounded():
    """Model lock with the per-request wait ceiling (504 on timeout).

    Used on request paths only; the micro-batcher's dispatcher keeps the
    unbounded lock (it IS the thing requests wait for)."""
    if not _model_lock.acquire(timeout=_request_timeout_s):
        raise RequestTimeout(
            f"request timed out after {_request_timeout_s:.0f}s waiting "
            "for the device"
        )
    try:
        yield
    finally:
        _model_lock.release()


@contextmanager
def _ref_audio(req: dict):
    """Voice-cloning reference from a request, as synthesize() kwargs.

    ``ref_audio_b64`` (base64 WAV bytes — the transport for remote
    clients) lands in a temp file for the duration of the request;
    ``ref_audio_path`` points at a server-local file. ``ref_text`` is the
    reference transcript (optional; enables the ref-ratio duration rule).
    Yields {} for ref-free requests.
    """
    import os
    import tempfile

    b64 = req.get("ref_audio_b64")
    path = req.get("ref_audio_path")
    if b64 and path:
        raise ValueError("pass ref_audio_b64 OR ref_audio_path, not both")
    if b64:
        try:
            data = base64.b64decode(b64, validate=True)
        except Exception as exc:
            raise ValueError(f"invalid ref_audio_b64: {exc}") from None
        fd, tmp = tempfile.mkstemp(suffix=".wav")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(data)
            yield {"ref_audio_path": tmp, "ref_text": req.get("ref_text")}
        finally:
            os.unlink(tmp)
    elif path:
        if not Path(path).exists():
            raise ValueError(f"ref_audio_path not found: {path}")
        yield {"ref_audio_path": path, "ref_text": req.get("ref_text")}
    else:
        yield {}


class Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    # socket timeout: an idle keep-alive connection (a load balancer
    # holding persistent sockets) reaps itself after this long —
    # handle_one_request treats the timeout as close_connection, so a
    # SIGTERM drain's server_close() can join every handler thread
    # instead of hanging forever on rfile.readline() (round-4 advisor)
    timeout = 30

    def _json(self, code: int, obj) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _authorized(self) -> bool:
        """Bearer-token gate for synthesis endpoints (no-op when unset)."""
        if _auth_token is None:
            return True
        import hmac

        header = self.headers.get("Authorization", "")
        supplied = header.removeprefix("Bearer ").strip()
        if header.startswith("Bearer ") and hmac.compare_digest(
            supplied, _auth_token
        ):
            return True
        self.send_response(401)
        self.send_header("WWW-Authenticate", "Bearer")
        body = b'{"error": "missing or invalid bearer token"}'
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)
        return False

    def do_GET(self):
        if self.path == "/healthz":
            merged = _batcher.merged_batches if _batcher else 0
            with _stats_lock:
                total = _requests_total
                lat = sorted(_latencies_s)
            stats = {"requests": total}
            if _batcher is not None:
                stats["shed_requests"] = _batcher.shed_requests
                stats["projected_wait_s"] = round(
                    _batcher.projected_wait_s(), 2
                )
            if lat:
                stats.update({
                    "latency_p50_ms": round(lat[len(lat) // 2] * 1e3, 1),
                    "latency_p95_ms": round(
                        lat[min(len(lat) - 1, int(len(lat) * 0.95))] * 1e3, 1
                    ),
                })
            status = "draining" if _draining else "ok"
            self._json(503 if _draining else 200,
                       {"status": status, "merged_batches": merged,
                        **stats, **_meta})
        else:
            self._json(404, {"error": "not found"})

    # generous for a base64 reference WAV (10 s @ 24 kHz ≈ 640 KB), tight
    # enough that a hostile Content-Length can't exhaust host memory
    MAX_BODY_BYTES = 32 * 1024 * 1024
    MAX_BATCH_TEXTS = 256

    def do_POST(self):
        if not self._authorized():
            # body undrained → keep-alive would desync on reuse
            self.close_connection = True
            return
        try:
            try:
                length = int(self.headers.get("Content-Length", 0))
            except ValueError:
                # unparseable header: like the out-of-range branch below,
                # the body was never drained, so keep-alive must not reuse
                # this connection (the body would parse as the next request)
                self.close_connection = True
                self._json(400, {"error": "invalid Content-Length header"})
                return
            if length < 0 or length > self.MAX_BODY_BYTES:
                # out-of-range body: the declared bytes are NOT drained, so
                # the connection must close — otherwise the next keep-alive
                # request parses the unread body as its request line
                # (desync); rfile.read(-1) would also block forever
                self.close_connection = True
                self._json(413, {"error": f"body size {length} out of "
                                          f"range (max {self.MAX_BODY_BYTES}"
                                          f" bytes)"})
                return
            req = json.loads(self.rfile.read(length) or b"{}")
        except (ValueError, json.JSONDecodeError):
            self._json(400, {"error": "invalid JSON body"})
            return

        try:
            sway = req.get("sway_sampling_coef", -1.0)
            # guidance interval: [lo, hi] list → hashable tuple (it is
            # part of the micro-batcher's parameter key)
            ci = req.get("cfg_interval", _profile_defaults.get("cfg_interval"))
            if ci is not None:
                if not isinstance(ci, (list, tuple)) or len(ci) != 2:
                    raise ValueError("cfg_interval must be [lo, hi]")
                ci = (float(ci[0]), float(ci[1]))
                if not 0.0 <= ci[0] <= ci[1]:
                    raise ValueError("cfg_interval needs 0 <= lo <= hi")
            ode_method = str(
                req.get("method", _profile_defaults.get("method", "euler"))
            )
            if ode_method not in ("euler", "midpoint"):
                raise ValueError("method must be 'euler' or 'midpoint'")
            common = dict(
                lang=req.get("lang", "mn"),
                n_steps=int(req.get("steps", 32)),
                cfg_strength=float(req.get("cfg_strength", 2.0)),
                # None disables the warp; anything else must be a float —
                # coerce here so garbage is a 400, not a 500 in the sampler
                sway_sampling_coef=None if sway is None else float(sway),
                speed=float(req.get("speed", 1.0)),
                cfg_interval=ci,
                method=ode_method,
            )
            # coerce here so a string/float seed is a 400 like every other
            # malformed parameter, not a 500 from deep inside PRNGKey
            seed = req.get("seed")
            if seed is not None:
                seed = int(seed)
        except (TypeError, ValueError) as exc:
            self._json(400, {"error": f"invalid parameter: {exc}"})
            return
        t0 = time.perf_counter()
        try:
            with _ref_audio(req) as ref:
                if ref:
                    common = dict(common, **ref)
                if self.path == "/synthesize":
                    text = req.get("text")
                    if not isinstance(text, str) or not text.strip():
                        self._json(400, {"error": "missing 'text' string"})
                        return
                    wav = self._synthesize_one(text, seed, common,
                                               cloned=bool(ref))
                    body = _wav_bytes(wav, _model.sample_rate)
                    self.send_response(200)
                    self.send_header("Content-Type", "audio/wav")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif self.path == "/synthesize_stream":
                    text = req.get("text")
                    if not isinstance(text, str) or not text.strip():
                        self._json(400, {"error": "missing 'text' string"})
                        return
                    self._stream(text, seed, common)
                    _record_latency(t0)
                elif self.path == "/synthesize_batch":
                    texts = req.get("texts")
                    if (not texts or not isinstance(texts, list)
                            or not all(isinstance(t, str) for t in texts)):
                        self._json(400, {"error": "missing 'texts' list "
                                                  "of strings"})
                        return
                    if len(texts) > self.MAX_BATCH_TEXTS:
                        self._json(413, {
                            "error": f"too many texts ({len(texts)}; max "
                                     f"{self.MAX_BATCH_TEXTS} per request)",
                        })
                        return
                    with _model_lock_bounded():
                        wavs = _model.synthesize_batch(
                            texts, seed=seed, **common
                        )
                    self._json(200, {
                        "sample_rate": _model.sample_rate,
                        "wavs_base64": [
                            base64.b64encode(
                                _wav_bytes(w, _model.sample_rate)
                            ).decode() for w in wavs
                        ],
                    })
                    _record_latency(t0)
                else:
                    self._json(404, {"error": "not found"})
        except Overloaded as exc:
            # shed load early with a machine-readable backoff hint
            body = json.dumps({"error": str(exc)}).encode()
            self.send_response(429)
            self.send_header("Content-Type", "application/json")
            self.send_header("Retry-After",
                             str(max(1, int(exc.retry_after_s + 0.5))))
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        except RequestTimeout as exc:
            self._json(504, {"error": str(exc)})
        except ValueError as exc:
            self._json(400, {"error": str(exc)})
        except Exception as exc:  # noqa: BLE001 — keep the server alive
            self._json(500, {"error": f"{type(exc).__name__}: {exc}"})

    def _synthesize_one(self, text: str, seed, common: dict,
                        cloned: bool = False):
        """All ref-free requests ride the micro-batcher (synthesize_batch
        chunks long texts itself, so a paragraph merges its chunk rows
        with other requests' rows). A seeded request reproduces its solo
        synthesize() output; an unseeded one is pinned to seed 0 (chunk c
        then draws from PRNGKey(0+c) — same rule a seeded request uses)."""
        t0 = time.perf_counter()
        try:
            # cloned requests skip the batcher: the ref mel is part of the
            # solve, so merging would require identical refs per group
            if _batcher is not None and not cloned:
                return _batcher.submit(
                    text, 0 if seed is None else int(seed), common,
                )
            with _model_lock_bounded():
                return _model.synthesize(text=text, seed=seed, **common)
        finally:
            _record_latency(t0)

    def _stream(self, text: str, seed, common: dict) -> None:
        from oron_tts_tpu.data.wav import pcm16_bytes, wav_stream_header

        # synthesize_stream is a generator: its validation only runs at the
        # first next(). Pull the first piece BEFORE sending headers so a
        # ValueError still surfaces as a clean 400 (do_POST's handler) —
        # otherwise a second status line would be injected into an open
        # chunked response and the terminator never written.
        gen = _model.synthesize_stream(text=text, seed=seed, **common)
        with _model_lock_bounded():
            first = next(gen)

        self.send_response(200)
        self.send_header("Content-Type", "audio/wav")
        self.send_header("Transfer-Encoding", "chunked")
        self.end_headers()

        def write_chunk(payload: bytes) -> None:
            self.wfile.write(f"{len(payload):X}\r\n".encode())
            self.wfile.write(payload)
            self.wfile.write(b"\r\n")

        # The model lock guards only the next() calls (device work); socket
        # writes happen OUTSIDE it, so a slow-reading client can't block
        # the micro-batcher and every other request on TCP backpressure.
        # Once headers are out, a failure can only be reported by cutting
        # the chunked stream short (no terminator) — never by raising into
        # do_POST's JSON error path, which would inject a second response.
        try:
            write_chunk(wav_stream_header(_model.sample_rate))
            write_chunk(pcm16_bytes(first))
            while True:
                with _model_lock:
                    try:
                        piece = next(gen)
                    except StopIteration:
                        break
                write_chunk(pcm16_bytes(piece))
            self.wfile.write(b"0\r\n\r\n")
        except Exception as exc:  # noqa: BLE001 — stream already started
            self.log_message("stream aborted: %s: %s",
                             type(exc).__name__, exc)
            self.close_connection = True

    def log_message(self, fmt, *fmt_args):  # quieter default logging
        print(f"[serve] {self.address_string()} {fmt % fmt_args}")


def prewarm_lattice(model, max_batch: int = 16,
                    chunk_chars: Sequence[int] = (38, 76, 120),
                    n_steps: int = 32, **solver_kwargs) -> int:
    """Compile every (padded-rows, T-bucket) executable live traffic can
    reach for the given chunk lengths, by driving the REAL serving path.

    Rather than reconstructing jit avals by hand (fragile), each combo is
    produced the way live traffic produces it: ``synthesize_batch`` on r
    same-length texts → one length group of exactly that padded row count
    and bucket. ``_length_groups`` caps rows at GROUP_FRAME_BUDGET//bucket
    and ``_pad_rows`` aliases odd sizes onto even avals, so the reachable
    lattice per bucket is small ({1,2} ∪ evens ≤ cap — ≤9 combos); combos
    that cannot occur live are never compiled. Each solve also warms the
    matching vocoder-decode executable and, with the persistent compile
    cache enabled, persists everything for later restarts. Returns the
    number of distinct executables warmed."""
    cls = type(model)
    row_multiple = model._row_multiple
    warmed = 0
    for c in chunk_chars:
        frames = max(50, int(c * 13))
        bucket = model._bucket(frames)
        cap = min(max_batch,
                  max(1, cls.GROUP_FRAME_BUDGET * max(1, row_multiple)
                      // bucket))
        if row_multiple > 1:
            cap = max(row_multiple, cap - cap % row_multiple)
        seen: set[int] = set()
        for rows in range(1, cap + 1):
            padded = cls._pad_rows(rows, row_multiple)
            if padded in seen:
                continue
            seen.add(padded)
            t0 = time.perf_counter()
            model.synthesize_batch(["а" * c] * rows, n_steps=n_steps, seed=0,
                                   **solver_kwargs)
            warmed += 1
            print(f"[serve] prewarm rows={padded} bucket={bucket}: "
                  f"{time.perf_counter() - t0:.1f}s")
    print(f"[serve] prewarm done: {warmed} (rows, bucket) combos compiled")
    return warmed


def main() -> None:
    global _model, _batcher
    parser = argparse.ArgumentParser(description="OronTTS-TPU HTTP server")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--vocoder", type=str, default=None)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--no-ema", action="store_true")
    parser.add_argument("--warmup", action="store_true",
                        help="Pre-compile the default chunk bucket at startup")
    parser.add_argument("--warmup-full", nargs="?", const="38,76,120",
                        default=None, metavar="CHARS",
                        help="Pre-compile EVERY (rows, T-bucket) executable "
                             "live traffic can reach for the given "
                             "comma-separated chunk lengths in characters "
                             "(default 38,76,120 → 512/1024/1664-frame "
                             "buckets). One-time deploy cost; combined "
                             "with the persistent compile cache, later "
                             "restarts warm in seconds and requests at the "
                             "warmed lengths never pay a compile (other "
                             "lengths hit other 64-frame buckets and still "
                             "compile once each).")
    parser.add_argument("--no-batching", action="store_true",
                        help="Disable the cross-request micro-batcher "
                             "(each /synthesize runs alone)")
    parser.add_argument("--max-batch", type=int, default=16,
                        help="Micro-batcher cap on merged requests per solve")
    parser.add_argument("--max-queue", type=int, default=64,
                        help="Admission-control cap on queued /synthesize "
                             "requests; beyond it (or when the projected "
                             "wait exceeds --request-timeout) new requests "
                             "get 429 + Retry-After instead of queueing "
                             "toward a certain 504")
    parser.add_argument("--profile", type=str, default=None,
                        choices=["fast"],
                        help="'fast' composes the measured-best opt-in "
                             "speed levers as server defaults: int8_dynamic "
                             "w8a8 weights + guidance interval [0.10, 0.70] "
                             "(-35.7%% solve time composed, ablation in "
                             "docs/KERNELS.md; midpoint is deliberately NOT "
                             "included — at a fixed step count it doubles "
                             "NFE, it trades steps for accuracy, not "
                             "speed). Per-request parameters still "
                             "override.")
    parser.add_argument("--no-scan-blocks", action="store_true",
                        help="Use the unrolled DiT block loop instead of "
                             "lax.scan (identical numerics; scan compiles "
                             "~depth× faster, so it is the serving default)")
    parser.add_argument("--device", type=str, default=None)
    parser.add_argument("--quantize", type=str, default=None,
                        choices=["int8", "int8_dynamic"],
                        help="Serve the DiT projections in int8: 'int8' = "
                             "w8a16 (single-device), 'int8_dynamic' = "
                             "w8a8 (composes with --mesh)")
    parser.add_argument("--fp32", action="store_true",
                        help="Force float32 compute + params (default: "
                             "bf16 on TPU — the measured configuration)")
    parser.add_argument("--mesh", type=str, default=None,
                        help="Multi-chip serving mesh as DPxTP (e.g. 2x4): "
                             "batch rows shard over DP, attention/FFN "
                             "projections over TP")
    parser.add_argument("--auth-token", type=str, default=None,
                        help="Require 'Authorization: Bearer <token>' on "
                             "synthesis endpoints (/healthz stays open). "
                             "Also settable via ORON_SERVE_TOKEN.")
    parser.add_argument("--request-timeout", type=float, default=120.0,
                        help="Max seconds a request waits for device work "
                             "(batcher queue / model lock) before 504/503; "
                             "a solve already on the chip is never "
                             "interrupted")
    args = parser.parse_args()

    if args.device:
        from oron_tts_tpu.utils.env import pin_platform

        pin_platform(args.device)
    from oron_tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from oron_tts_tpu.cli.infer import load_model

    from oron_tts_tpu.cli import validate_quantize_mesh

    if args.profile == "fast":
        # profile defaults compose with explicit flags; an explicit
        # --quantize always wins over the profile's int8_dynamic
        if args.quantize is None:
            args.quantize = "int8_dynamic"
        _profile_defaults["cfg_interval"] = (0.10, 0.70)
        _meta["profile"] = "fast"
        print("[serve] profile=fast: int8_dynamic + cfg_interval(0.10,0.70)"
              " defaults")
    validate_quantize_mesh(parser, args.quantize, args.mesh)
    _model = load_model(args.checkpoint, use_ema=not args.no_ema,
                        scan_blocks=not args.no_scan_blocks,
                        precision="float32" if args.fp32 else None,
                        quantize=args.quantize)
    if args.quantize:
        _meta["quantize"] = args.quantize
    if args.vocoder:
        _model.load_vocoder(args.vocoder)
    if args.mesh:
        from oron_tts_tpu.parallel.mesh import mesh_from_spec

        mesh = mesh_from_spec(args.mesh)
        _model.set_mesh(mesh)
        _meta["mesh"] = dict(mesh.shape)
        print(f"[serve] mesh: {dict(mesh.shape)}")
    _meta["params"] = _model.num_params()
    if not args.no_batching:
        _batcher = MicroBatcher(_model, max_batch=args.max_batch,
                                max_queue=args.max_queue)
    if args.warmup_full is not None:
        chars = [int(c) for c in args.warmup_full.split(",") if c.strip()]
        prewarm_lattice(_model, max_batch=args.max_batch, chunk_chars=chars,
                        **_profile_defaults)
    elif args.warmup:
        # warm the EXACT path real requests take. With batching enabled,
        # /synthesize rides the micro-batcher → synthesize_batch →
        # _dispatch_chunk_groups, whose jit avals (stacked [B,2] keys,
        # int32 durations) differ from the solo segment path — warming the
        # solo path alone would leave the first live request to pay the
        # full sampler compile. Default steps=32 on the full 120-char
        # chunk bucket (the sampler cache keys on both).
        print("[serve] warmup synthesis (compiles the default request shape)...")
        if _batcher is not None:
            _model.synthesize_batch(["а" * 120], n_steps=32, seed=0,
                                    **_profile_defaults)
        else:
            _model.synthesize("а" * 120, n_steps=32, **_profile_defaults)
        print("[serve] warmup done")

    global _auth_token, _request_timeout_s
    import os

    _auth_token = args.auth_token or os.environ.get("ORON_SERVE_TOKEN")
    if _auth_token:
        print("[serve] bearer-token auth enabled")
    _request_timeout_s = args.request_timeout

    server = DrainingHTTPServer((args.host, args.port), Handler)
    install_drain_handlers(server)
    print(f"[serve] listening on http://{args.host}:{args.port}")
    server.serve_forever()
    # SIGTERM path: serve_forever returned after shutdown(); server_close
    # joins the non-daemon handler threads, so every accepted request
    # finishes its response before the process exits
    server.server_close()
    print("[serve] drained, exiting")


class DrainingHTTPServer(ThreadingHTTPServer):
    """ThreadingHTTPServer that can drain instead of dropping requests.

    ``daemon_threads = False`` + ``block_on_close = True`` make
    ``server_close()`` join in-flight handler threads — combined with the
    SIGTERM handler below, a terminating deploy finishes every accepted
    request (the micro-batcher's queued submits are synchronous waits
    inside those handler threads, so the batcher drains with them).
    """

    daemon_threads = False
    block_on_close = True
    # socketserver's default listen backlog is 5: a burst of concurrent
    # clients (measured: 32 simultaneous connects in
    # scripts/bench_serve_load.py) gets connection-reset before accept.
    # TTS solves queue for seconds, so deep connection queues are normal.
    request_queue_size = 128


def install_drain_handlers(server) -> None:
    """SIGTERM/SIGINT → flip /healthz to 503 "draining", stop accepting,
    let main() join the in-flight handlers. Safe to call only from the
    main thread (signal module requirement)."""
    import signal

    def _on_term(signum, frame):  # noqa: ARG001 — signal signature
        global _draining
        if _draining:
            # second signal = the operator gave up on a graceful drain
            # (e.g. a handler thread wedged past the socket timeout):
            # force-exit instead of swallowing the signal forever
            # (round-4 advisor)
            import os

            print("[serve] second SIGTERM: force exit")
            os._exit(1)
        _draining = True
        print("[serve] SIGTERM: draining in-flight requests...")
        # shutdown() blocks until serve_forever exits — run it off the
        # signal frame so the handler returns immediately
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)


if __name__ == "__main__":
    main()
