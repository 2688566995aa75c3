"""HTTP serving layer: real requests against an in-process server."""

import base64
import json
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

import oron_tts_tpu.cli.serve as serve
from oron_tts_tpu.config import F5Config
from oron_tts_tpu.models.f5tts import F5TTS

TINY_CFG = {
    "sample_rate": 24000, "n_mels": 100,
    "model": {"vocab_size": 65, "dim": 64, "depth": 1, "heads": 2,
              "ff_mult": 2, "text_dim": 32, "conv_layers": 1,
              "p_dropout": 0.0},
}


@pytest.fixture(scope="module")
def server_port():
    model = F5TTS.from_config(F5Config.from_dict(TINY_CFG))
    model.init_params(0)
    serve._model = model
    serve._batcher = serve.MicroBatcher(model)
    serve._meta["params"] = model.num_params()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), serve.Handler)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield httpd.server_address[1]
    httpd.shutdown()


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=300) as resp:
            return resp.status, resp.headers.get("Content-Type"), resp.read()
    except urllib.error.HTTPError as exc:
        return exc.code, exc.headers.get("Content-Type"), exc.read()


def test_healthz(server_port):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server_port}/healthz", timeout=30
    ) as resp:
        body = json.loads(resp.read())
    assert body["status"] == "ok"
    assert body["params"] > 0


def test_synthesize_returns_wav(server_port):
    status, ctype, body = _post(
        server_port, "/synthesize", {"text": "сайн", "steps": 1, "seed": 0}
    )
    assert status == 200 and ctype == "audio/wav"
    assert body[:4] == b"RIFF"
    from oron_tts_tpu.data.wav import read_wav_bytes

    wav, sr = read_wav_bytes(body)
    assert sr == 24000 and len(wav) > 0 and np.isfinite(wav).all()


def test_synthesize_batch(server_port):
    status, _, body = _post(
        server_port, "/synthesize_batch",
        {"texts": ["нэг", "хоёр"], "steps": 1},
    )
    assert status == 200
    payload = json.loads(body)
    assert len(payload["wavs_base64"]) == 2
    assert base64.b64decode(payload["wavs_base64"][0])[:4] == b"RIFF"


def test_stream_endpoint_matches_synthesize(server_port):
    """/synthesize_stream's concatenated PCM payload equals /synthesize's
    (same text/seed), modulo the streaming header's unknown-size fields."""
    text = "Нэг өгүүлбэр энд байна. Хоёр дахь өгүүлбэр арай урт байгаа."
    body = {"text": text, "steps": 1, "seed": 2}
    status, ctype, streamed = _post(server_port, "/synthesize_stream", body)
    assert status == 200 and ctype == "audio/wav"
    assert streamed[:4] == b"RIFF"
    status, _, solo = _post(server_port, "/synthesize", body)
    assert status == 200
    assert len(streamed) == len(solo)
    from oron_tts_tpu.data.wav import read_wav_bytes

    # stream isolates chunk 0 for TTFA → solves group differently; float
    # reduction order may move a sample by a PCM16 LSB. Decode BOTH through
    # read_wav_bytes (it handles the streaming unknown-size header) so the
    # int16→float scale is identical and the tolerance is pure drift budget
    got, _ = read_wav_bytes(streamed)
    want, _ = read_wav_bytes(solo)
    np.testing.assert_allclose(got, want, atol=2.5 / 32767)


def test_concurrent_requests_merge_and_match_solo(server_port):
    """Requests queued while the device is busy merge into one solve and
    still return each request's solo audio (per-seed determinism)."""
    texts = ["нэг хоёр гурав", "сайн байна уу", "тавтай морилно уу"]
    seeds = [3, 7, 11]
    solo = [
        _post(server_port, "/synthesize",
              {"text": t, "steps": 1, "seed": s})[2]
        for t, s in zip(texts, seeds)
    ]

    before = serve._batcher.merged_batches
    with serve._model_lock:  # stall the batcher so all three queue up
        results = [None] * 3
        threads = []
        for i, (t, s) in enumerate(zip(texts, seeds)):
            def worker(i=i, t=t, s=s):
                results[i] = _post(server_port, "/synthesize",
                                   {"text": t, "steps": 1, "seed": s})
            th = threading.Thread(target=worker)
            th.start()
            threads.append(th)
        import time

        time.sleep(0.5)  # all three requests reach the batcher queue
    for th in threads:
        th.join(timeout=300)
    assert serve._batcher.merged_batches > before
    from oron_tts_tpu.data.wav import read_wav_bytes

    for (status, ctype, body), expect in zip(results, solo):
        assert status == 200 and ctype == "audio/wav"
        got, _ = read_wav_bytes(body)
        want, _ = read_wav_bytes(expect)
        # same PRNG draw per seed; batched vs solo solves may differ by
        # float reduction order → allow a couple of PCM16 LSBs
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2.5 / 32767)


def test_voice_cloning_endpoint(server_port, tmp_path):
    """A base64-WAV reference clones the voice; output matches the solo
    facade call with the same ref and seed."""
    from oron_tts_tpu.data.wav import read_wav_bytes, wav_bytes, write_wav

    sr = 24000
    t = np.arange(sr // 2) / sr
    ref = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    ref_b64 = base64.b64encode(wav_bytes(ref, sr)).decode()

    body = {"text": "сайн", "steps": 1, "seed": 6,
            "ref_audio_b64": ref_b64, "ref_text": "тийм"}
    status, ctype, payload = _post(server_port, "/synthesize", body)
    assert status == 200 and ctype == "audio/wav"
    got, _ = read_wav_bytes(payload)

    ref_path = tmp_path / "ref.wav"
    write_wav(ref_path, ref, sr)
    want = serve._model.synthesize(
        "сайн", n_steps=1, seed=6, ref_audio_path=ref_path, ref_text="тийм",
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2.5 / 32767)

    # bad base64 is a clean 400
    status, _, payload = _post(
        server_port, "/synthesize",
        {"text": "x", "steps": 1, "ref_audio_b64": "!!!not-base64!!!"},
    )
    assert status == 400 and b"ref_audio_b64" in payload


def test_error_paths(server_port):
    status, _, body = _post(server_port, "/synthesize", {})
    assert status == 400 and b"missing 'text'" in body
    # whitespace-only text is rejected at the door (not inside a merged
    # batch, where it would poison co-batched requests)
    status, _, body = _post(server_port, "/synthesize", {"text": "   "})
    assert status == 400 and b"missing 'text'" in body
    # the stream endpoint validates BEFORE sending chunked headers, so a
    # bad request still gets a clean 400 JSON response
    status, ctype, body = _post(
        server_port, "/synthesize_stream", {"text": "x", "steps": 0},
    )
    assert status == 400 and ctype == "application/json"
    status, _, body = _post(server_port, "/synthesize", {"text": "x", "steps": None})
    assert status == 400 and b"invalid parameter" in body
    # non-string text is a 400 at the door, not a 500 TypeError from
    # deep inside split_text_for_synthesis
    status, _, body = _post(server_port, "/synthesize", {"text": 123})
    assert status == 400 and b"missing 'text'" in body
    status, _, body = _post(server_port, "/synthesize_stream", {"text": 123})
    assert status == 400 and b"missing 'text'" in body
    status, _, body = _post(server_port, "/synthesize_batch",
                            {"texts": ["ok", 5]})
    assert status == 400 and b"missing 'texts'" in body
    status, _, body = _post(server_port, "/synthesize",
                            {"text": "x", "lang": "en", "steps": 1})
    assert status == 400 and "Unsupported language".encode() in body
    status, _, body = _post(server_port, "/synthesize",
                            {"text": "x", "sway_sampling_coef": "abc"})
    assert status == 400 and b"invalid parameter" in body
    status, _, body = _post(
        server_port, "/synthesize_batch",
        {"texts": ["x"] * (serve.Handler.MAX_BATCH_TEXTS + 1)},
    )
    assert status == 413 and b"too many texts" in body
    status, _, _ = _post(server_port, "/nope", {})
    assert status == 404


def test_take_batch_rotates_busy_keys():
    """A key whose backlog exceeds max_batch must rotate to the back of
    the queue dict, or sustained same-key load starves other keys."""
    b = serve.MicroBatcher.__new__(serve.MicroBatcher)  # no dispatcher thread
    b._max_batch = 2
    reqs_a = [serve._Request(f"a{i}", 0) for i in range(5)]
    req_b = serve._Request("b", 0)
    b._queues = {("k", "a"): list(reqs_a), ("k", "b"): [req_b]}
    b._queued = 6

    key1, batch1 = b._take_batch()
    assert key1 == ("k", "a") and batch1 == reqs_a[:2]
    # key A still has backlog, but key B must be served next
    key2, batch2 = b._take_batch()
    assert key2 == ("k", "b") and batch2 == [req_b]
    key3, batch3 = b._take_batch()
    assert key3 == ("k", "a") and batch3 == reqs_a[2:4]
    # drained keys vanish (no unbounded growth from stale param combos)
    b._take_batch()
    assert b._take_batch() == (None, None)
    assert b._queues == {}


def test_batcher_isolates_bad_request(server_port):
    """A request that fails inside a merged solve must not fail its
    co-batched neighbors: the batcher retries survivors individually."""
    model = serve._model
    batcher = serve.MicroBatcher(model, window_s=0.2)
    params = dict(lang="mn", n_steps=1, cfg_strength=2.0,
                  sway_sampling_coef=-1.0, speed=1.0)
    results = {}

    def submit(name, text):
        try:
            results[name] = batcher.submit(text, 5, params)
        except Exception as exc:  # noqa: BLE001
            results[name] = exc

    threads = [
        threading.Thread(target=submit, args=("good", "сайн")),
        threading.Thread(target=submit, args=("bad", "   ")),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert isinstance(results["bad"], ValueError)
    assert isinstance(results["good"], np.ndarray) and len(results["good"])


def test_hostile_content_length(server_port):
    """Negative Content-Length must be rejected AND the connection closed
    (rfile.read(-1) would otherwise block a handler thread forever); an
    oversized declared length must close too, or the unread body bytes
    desync the next keep-alive request."""
    import socket

    for bad_len in (-1, serve.Handler.MAX_BODY_BYTES + 1):
        with socket.create_connection(("127.0.0.1", server_port),
                                      timeout=10) as s:
            s.sendall(
                b"POST /synthesize HTTP/1.1\r\n"
                b"Host: t\r\nContent-Type: application/json\r\n"
                + f"Content-Length: {bad_len}\r\n\r\n".encode()
            )
            # for the oversized case, also send SOME body bytes that the
            # server must not interpret as a second request
            if bad_len > 0:
                s.sendall(b'GET /healthz HTTP/1.1\r\n\r\n')
            s.settimeout(10)
            data = b""
            while b"\r\n\r\n" not in data:
                chunk = s.recv(4096)
                if not chunk:
                    break
                data += chunk
            assert b"413" in data.split(b"\r\n", 1)[0], data[:120]
            # server must close: recv drains to EOF rather than hanging
            # on a half-open keep-alive connection
            rest = b""
            while True:
                chunk = s.recv(4096)
                if not chunk:
                    break
                rest += chunk
            assert b"HTTP/1.1 200" not in rest  # no desynced 2nd response


def test_non_integer_content_length(server_port):
    """An unparseable Content-Length must 400 AND close the connection:
    the body was never drained, so keep-alive reuse would parse it as the
    next request line (same desync as the out-of-range case)."""
    import socket

    with socket.create_connection(("127.0.0.1", server_port),
                                  timeout=10) as s:
        s.sendall(
            b"POST /synthesize HTTP/1.1\r\n"
            b"Host: t\r\nContent-Type: application/json\r\n"
            b"Content-Length: abc\r\n\r\n"
            b'GET /healthz HTTP/1.1\r\n\r\n'  # must NOT become a request
        )
        s.settimeout(10)
        data = b""
        while b"\r\n\r\n" not in data:
            chunk = s.recv(4096)
            if not chunk:
                break
            data += chunk
        assert b"400" in data.split(b"\r\n", 1)[0], data[:120]
        rest = b""
        while True:
            chunk = s.recv(4096)
            if not chunk:
                break
            rest += chunk
        assert b"HTTP/1.1 200" not in rest  # no desynced 2nd response


def test_batch_mixed_none_seeds(server_port):
    """A merged batch mixing unseeded and seeded requests must succeed
    on the BATCHED path (the chunk-seed rule maps None to base 0) and
    match solo synthesis for the seeded request."""
    status, _, body = _post(
        server_port, "/synthesize_batch",
        {"texts": ["сайн байна уу", "за тэгье"], "steps": 1},
    )
    assert status == 200


def test_prewarm_lattice_covers_live_traffic():
    """After prewarm_lattice, no live request shape within the warmed
    chunk lengths triggers a new jit entry — the first real request
    never pays a compile."""
    model = F5TTS.from_config(F5Config.from_dict(TINY_CFG))
    model.init_params(0)
    warmed = serve.prewarm_lattice(
        model, max_batch=4, chunk_chars=(10, 20), n_steps=2,
    )
    assert warmed == 6  # {1,2,4} rows x 2 buckets
    n_keys = len(model._sample_cache)
    # mixed lengths inside the warmed buckets: 10-14 non-space chars →
    # the 192-frame bucket, 20-24 → the 320-frame bucket (chars*13
    # rounded up to 64). Covers rows {1,2,4} and a mixed-length split.
    model.synthesize_batch(["а" * 11, "а" * 13, "а" * 21], n_steps=2)
    model.synthesize_batch(["а" * 22] * 4, n_steps=2)
    model.synthesize_batch(["а" * 10], n_steps=2)
    assert len(model._sample_cache) == n_keys, (
        "live request compiled a shape prewarm missed: "
        f"{sorted(map(str, model._sample_cache))}"
    )


def test_prewarm_lattice_covers_live_traffic_under_mesh():
    """Mesh serving (row_multiple > 1): prewarm pads rows to the data
    axis, so the per-bucket lattice collapses to one combo and a later
    live request of ANY row count ≤ max_batch reuses a warmed executable
    (regression for the --warmup-full + set_mesh composition)."""
    import jax

    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = jax.sharding.Mesh(devices, ("data", "model"))
    model = F5TTS.from_config(F5Config.from_dict(TINY_CFG))
    model.init_params(0)
    model.set_mesh(mesh)
    assert model._row_multiple == 4
    warmed = serve.prewarm_lattice(
        model, max_batch=4, chunk_chars=(10, 20), n_steps=2,
    )
    assert warmed == 2  # rows 1..4 all pad to 4 → one combo per bucket
    n_keys = len(model._sample_cache)
    # 1, 3, and 4 live rows (and a mixed-length 2-bucket split) must all
    # land on the prewarmed 4-row avals
    model.synthesize_batch(["а" * 11], n_steps=2)
    model.synthesize_batch(["а" * 12, "а" * 13, "а" * 21], n_steps=2)
    model.synthesize_batch(["а" * 22] * 4, n_steps=2)
    assert len(model._sample_cache) == n_keys, (
        "live mesh request compiled a shape prewarm missed: "
        f"{sorted(map(str, model._sample_cache))}"
    )


def _post_auth(port, path, payload, token=None):
    headers = {}
    if token is not None:
        headers["Authorization"] = f"Bearer {token}"
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers=headers, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=300) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as exc:
        return exc.code, exc.read()


def test_bearer_auth_gate(server_port):
    serve._auth_token = "s3cret"
    try:
        code, body = _post_auth(server_port, "/synthesize", {"text": "сайн"})
        assert code == 401
        assert b"bearer" in body.lower()
        code, _ = _post_auth(server_port, "/synthesize", {"text": "сайн"},
                             token="wrong")
        assert code == 401
        code, body = _post_auth(server_port, "/synthesize",
                                {"text": "сайн", "steps": 2}, token="s3cret")
        assert code == 200 and len(body) > 44
        # healthz stays open for LB probes
        with urllib.request.urlopen(
            f"http://127.0.0.1:{server_port}/healthz", timeout=30
        ) as resp:
            assert resp.status == 200
    finally:
        serve._auth_token = None


def test_request_timeout_batcher_504(server_port):
    """A request stuck behind a wedged device gets a bounded 504, not a
    hang: hold the model lock so the batcher can't dispatch."""
    old = serve._request_timeout_s
    serve._request_timeout_s = 0.5
    try:
        with serve._model_lock:  # wedge the device path
            code, body = _post(server_port, "/synthesize",
                               {"text": "сайн", "steps": 2})[0::2]
            assert code == 504
            assert b"timed out" in body
    finally:
        serve._request_timeout_s = old


def test_request_timeout_direct_lock_504(server_port):
    """The non-batcher paths (synthesize_batch endpoint) bound their lock
    wait the same way."""
    old = serve._request_timeout_s
    serve._request_timeout_s = 0.5
    try:
        with serve._model_lock:
            code, body = _post(server_port, "/synthesize_batch",
                               {"texts": ["сайн"], "steps": 2})[0::2]
            assert code == 504
            assert b"timed out" in body
    finally:
        serve._request_timeout_s = old


def test_healthz_reports_draining(server_port):
    serve._draining = True
    try:
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{server_port}/healthz", timeout=30
            ) as resp:
                code, body = resp.status, resp.read()
        except urllib.error.HTTPError as exc:
            code, body = exc.code, exc.read()
        assert code == 503
        assert json.loads(body)["status"] == "draining"
    finally:
        serve._draining = False


def test_sigterm_drain_finishes_inflight_request():
    """DrainingHTTPServer + shutdown(): an accepted request completes its
    response even though the server stops accepting (deploy teardown)."""
    import time as _time

    model = serve._model

    class SlowModel:
        sample_rate = model.sample_rate

        def synthesize(self, text, seed=None, **kw):
            _time.sleep(0.8)
            return model.synthesize(text, seed=seed, **kw)

        def num_params(self):
            return model.num_params()

    saved_batcher = serve._batcher
    serve._batcher = None  # direct path so SlowModel.synthesize is used
    saved_model = serve._model
    serve._model = SlowModel()
    httpd = serve.DrainingHTTPServer(("127.0.0.1", 0), serve.Handler)
    thread = threading.Thread(target=httpd.serve_forever)
    thread.start()
    port = httpd.server_address[1]
    try:
        result = {}

        def client():
            result["resp"] = _post(port, "/synthesize",
                                   {"text": "сайн", "steps": 2})

        c = threading.Thread(target=client)
        c.start()
        _time.sleep(0.3)  # request accepted, solve in flight
        shut = threading.Thread(target=httpd.shutdown)
        shut.start()
        httpd.server_close()  # joins the in-flight handler thread
        shut.join(timeout=30)
        c.join(timeout=30)
        code, ctype, body = result["resp"]
        assert code == 200 and ctype == "audio/wav" and len(body) > 44
    finally:
        serve._model = saved_model
        serve._batcher = saved_batcher
        thread.join(timeout=30)


def test_admission_control_429(server_port):
    """When the projected wait exceeds the request timeout, new requests
    are shed with 429 + Retry-After instead of queueing toward a 504."""
    old = serve._request_timeout_s
    serve._request_timeout_s = 1.0
    saved = serve._batcher
    b = serve.MicroBatcher.__new__(serve.MicroBatcher)  # no dispatcher
    b._max_batch = 2
    b._max_queue = 64
    # real queued entries: the projected wait counts per-key solves
    b._queues = {("k", i): [serve._Request(f"t{j}", 0) for j in range(2)]
                 for i in range(5)}  # 5 keys x 2 reqs -> 5 solves ahead
    b._queued = 10
    b._solve_ewma_s = 5.0     # projected 25 s >> 1 s timeout
    b._cv = threading.Condition()
    b.merged_batches = 0
    b.shed_requests = 0
    serve._batcher = b
    try:
        code, _, body = _post(server_port, "/synthesize",
                              {"text": "сайн", "steps": 1})
        assert code == 429
        assert b"overloaded" in body
        assert b.shed_requests == 1
    finally:
        serve._batcher = saved
        serve._request_timeout_s = old


def test_admission_hard_queue_cap(server_port):
    """The hard --max-queue cap sheds even when the EWMA looks fast."""
    saved = serve._batcher
    b = serve.MicroBatcher.__new__(serve.MicroBatcher)
    b._max_batch = 16
    b._max_queue = 4
    b._queues = {}
    b._queued = 4
    b._solve_ewma_s = 0.001
    b._cv = threading.Condition()
    b.merged_batches = 0
    b.shed_requests = 0
    serve._batcher = b
    try:
        code = _post(server_port, "/synthesize",
                     {"text": "сайн", "steps": 1})[0]
        assert code == 429
    finally:
        serve._batcher = saved


def test_healthz_reports_shed_and_projected_wait(server_port):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server_port}/healthz", timeout=30
    ) as resp:
        body = json.loads(resp.read())
    assert "shed_requests" in body
    assert "projected_wait_s" in body


def test_abandoned_requests_dropped_by_dispatcher(server_port):
    """Entries whose handler already 504ed are dropped from the batch,
    not solved: the dispatcher must never burn device time on audio
    nobody will receive."""
    calls = []
    model = serve._model

    class CountingModel:
        sample_rate = model.sample_rate

        def synthesize_batch(self, texts, seeds=None, **kw):
            calls.append(list(texts))
            return model.synthesize_batch(texts, seeds=seeds, **kw)

        def num_params(self):
            return model.num_params()

    b = serve.MicroBatcher(CountingModel(), window_s=0.3)
    params = dict(lang="mn", n_steps=1, cfg_strength=2.0,
                  sway_sampling_coef=-1.0, speed=1.0)
    old = serve._request_timeout_s
    serve._request_timeout_s = 0.05  # every submit times out fast
    try:
        with serve._model_lock:  # wedge the device while requests queue
            with pytest.raises(serve.RequestTimeout):
                b.submit("сайн", 0, params)
            with pytest.raises(serve.RequestTimeout):
                b.submit("байна", 0, params)
            import time as _time

            _time.sleep(0.5)  # let the dispatcher take (and drop) them
    finally:
        serve._request_timeout_s = old
    import time as _time

    _time.sleep(1.0)
    assert calls == []  # both entries were abandoned → no solve at all
