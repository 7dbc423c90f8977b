#!/usr/bin/env python3
"""Serving-layer tests: HTTP feature/VAD/pitch endpoints over a live
threaded server, exact parity vs direct FeaturePipeline calls, decode
ladder, error paths, and concurrent clients sharing one pipeline."""

import io
import json
import threading
import time
import urllib.error
import urllib.request
import wave

import numpy as np
import pytest

from sspv_tpu.config import Config
from sspv_tpu.serve import (
    AudioDecodeError,
    FeatureService,
    decode_audio,
    make_server,
)


def _tone_i16(duration_s=2.0, freq=100.0, sr=None, amp=8000.0):
    sr = sr or Config.SAMPLE_RATE
    t = np.arange(int(duration_s * sr)) / sr
    sig = np.zeros_like(t)
    # voiced middle, silence around it: exercises VAD both ways
    lo, hi = len(t) // 4, 3 * len(t) // 4
    sig[lo:hi] = np.sin(2 * np.pi * freq * t[lo:hi]) * amp
    return sig.astype(np.int16), sr


def _wav_bytes(samples: np.ndarray, sr: int, channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


@pytest.fixture(scope="module")
def server():
    srv = make_server("127.0.0.1", 0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def _post(server, path, body, content_type="audio/wav", headers=None):
    host, port = server.server_address[:2]
    req = urllib.request.Request(
        f"http://{host}:{port}{path}", data=body, method="POST",
        headers={"Content-Type": content_type, **(headers or {})},
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        return resp.status, resp.headers.get("Content-Type"), resp.read()


def _get(server, path):
    host, port = server.server_address[:2]
    with urllib.request.urlopen(
        f"http://{host}:{port}{path}", timeout=120
    ) as resp:
        return resp.status, json.loads(resp.read())


# ---------------------------------------------------------------------------
# decode_audio unit behavior
# ---------------------------------------------------------------------------


def test_decode_wav_roundtrip():
    samples, sr = _tone_i16(0.5)
    out, out_sr = decode_audio(_wav_bytes(samples, sr), "audio/wav")
    assert out_sr == sr
    np.testing.assert_array_equal(out, samples)


def test_decode_wav_stereo_mean_downmix():
    samples, sr = _tone_i16(0.25)
    stereo = np.stack([samples, np.zeros_like(samples)], axis=1).reshape(-1)
    out, _ = decode_audio(_wav_bytes(stereo, sr, channels=2), "audio/wav")
    np.testing.assert_allclose(out, (samples / 2).astype(np.int16), atol=1)


def test_decode_wav_8_and_32_bit():
    samples, sr = _tone_i16(0.25)
    # 32-bit PCM: int32 = int16 << 16, decoder scales back by /65536
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(4); w.setframerate(sr)
        w.writeframes((samples.astype(np.int32) << 16).astype("<i4").tobytes())
    out32, _ = decode_audio(buf.getvalue(), "audio/wav")
    np.testing.assert_array_equal(out32, samples)
    # 8-bit PCM is unsigned; decoder rescales by 256
    u8 = ((samples.astype(np.int32) // 256) + 128).astype(np.uint8)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(1); w.setframerate(sr)
        w.writeframes(u8.tobytes())
    out8, _ = decode_audio(buf.getvalue(), "audio/wav")
    np.testing.assert_allclose(out8, (samples // 256) * 256, atol=0)


def test_decode_raw_pcm_needs_rate():
    samples, _ = _tone_i16(0.1)
    with pytest.raises(AudioDecodeError):
        decode_audio(samples.tobytes(), "application/octet-stream", None)
    out, sr = decode_audio(samples.tobytes(), "application/octet-stream", 8000)
    assert sr == 8000
    np.testing.assert_array_equal(out, samples)


def test_decode_rejects_garbage():
    with pytest.raises(AudioDecodeError):
        decode_audio(b"RIFFnotawav", "audio/wav")
    with pytest.raises(AudioDecodeError):
        decode_audio(b"", "audio/wav")
    with pytest.raises(AudioDecodeError):
        decode_audio(b"x" * 10, "text/plain")


# ---------------------------------------------------------------------------
# FeatureService parity vs the pipeline
# ---------------------------------------------------------------------------


def test_service_matches_pipeline_exactly():
    samples, sr = _tone_i16(2.0)
    svc = FeatureService()
    res = svc.analyze(samples, sr)
    block, _ = svc.pipe.process_signal_auto(samples.astype(np.float32))
    np.testing.assert_array_equal(res["vad"], np.asarray(block.vad))
    np.testing.assert_array_equal(res["energy"], np.asarray(block.energy))
    np.testing.assert_array_equal(res["mfcc"], np.asarray(block.mfcc))
    assert res["num_frames"] == np.asarray(block.vad).shape[0]
    assert res["vad"].sum() > 0  # the tone is detected


def test_service_short_and_empty_inputs():
    svc = FeatureService()
    res = svc.analyze(np.zeros((10,), np.int16), Config.SAMPLE_RATE,
                      want_pitch=True)
    assert res["num_frames"] == 0
    assert res["f0"].shape == (0,)
    res = svc.analyze(np.zeros((0,), np.int16), Config.SAMPLE_RATE)
    assert res["num_frames"] == 0


def test_service_pitch_tracks_tone():
    samples, sr = _tone_i16(2.0, freq=100.0)
    svc = FeatureService()
    res = svc.analyze(samples, sr, want_pitch=True)
    f0 = res["f0"]
    voiced = f0[f0 > 0]
    assert len(voiced) > 10
    assert abs(np.median(voiced) - 100.0) < 5.0


def test_service_resamples_foreign_rates():
    # same tone delivered at 8 kHz must still be analyzed at 16 kHz
    samples8k, _ = _tone_i16(2.0, freq=100.0, sr=8000)
    svc = FeatureService()
    res = svc.analyze(samples8k, 8000)
    assert res["sample_rate"] == Config.SAMPLE_RATE
    assert res["num_samples"] == 2 * Config.SAMPLE_RATE
    assert res["vad"].sum() > 0


# ---------------------------------------------------------------------------
# HTTP endpoints
# ---------------------------------------------------------------------------


def test_http_healthz_and_config(server):
    status, health = _get(server, "/healthz")
    assert status == 200 and health["status"] == "ok"
    assert health["device_count"] >= 1
    status, cfg = _get(server, "/config")
    assert status == 200
    assert cfg["SAMPLE_RATE"] == Config.SAMPLE_RATE


def test_http_features_json_matches_direct(server):
    samples, sr = _tone_i16(2.0)
    status, ctype, body = _post(server, "/v1/features", _wav_bytes(samples, sr))
    assert status == 200 and ctype == "application/json"
    res = json.loads(body)
    svc = server.RequestHandlerClass.service
    direct = svc.analyze(samples, sr)
    assert res["num_frames"] == direct["num_frames"] > 0
    np.testing.assert_array_equal(np.asarray(res["vad"]), direct["vad"])
    np.testing.assert_allclose(
        np.asarray(res["energy"], np.float32), direct["energy"], rtol=1e-6
    )
    assert np.asarray(res["mfcc"]).shape == direct["mfcc"].shape


def test_http_vad_npz_format(server):
    samples, sr = _tone_i16(1.0)
    status, ctype, body = _post(
        server, "/v1/vad?fmt=npz", _wav_bytes(samples, sr)
    )
    assert status == 200 and ctype == "application/octet-stream"
    with np.load(io.BytesIO(body)) as z:
        assert set(z.files) >= {"vad", "vad_adaptive", "num_frames"}
        assert z["vad"].shape[0] == int(z["num_frames"])


def test_http_pitch_endpoint(server):
    samples, sr = _tone_i16(2.0, freq=200.0)
    status, _, body = _post(server, "/v1/pitch", _wav_bytes(samples, sr))
    assert status == 200
    res = json.loads(body)
    f0 = np.asarray(res["f0"])
    voiced = f0[f0 > 0]
    assert len(voiced) > 10
    assert abs(np.median(voiced) - 200.0) < 8.0


def test_http_raw_pcm_with_rate_header(server):
    samples, sr = _tone_i16(1.0)
    status, _, body = _post(
        server, "/v1/vad", samples.tobytes(),
        content_type="application/octet-stream",
        headers={"X-Sample-Rate": str(sr)},
    )
    assert status == 200
    assert np.asarray(json.loads(body)["vad"]).sum() > 0


def test_http_error_paths(server):
    samples, sr = _tone_i16(0.2)
    for path, body, ctype, want in [
        ("/v1/features", b"not audio at all", "audio/wav", 400),
        ("/v1/features", b"", "audio/wav", 400),
        ("/v1/nope", _wav_bytes(samples, sr), "audio/wav", 404),
        ("/v1/features", samples.tobytes(), "application/octet-stream", 400),
    ]:
        try:
            status, _, _ = _post(server, path, body, content_type=ctype)
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == want, (path, status)
    try:
        status, _ = _get(server, "/nope")
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 404


def test_http_bad_query_params_are_400(server):
    samples, sr = _tone_i16(0.5)
    wav = _wav_bytes(samples, sr)
    for q in ("?fmin=abc", "?min_confidence=nan&fmin=inf", "?fmin=400&fmax=50"):
        try:
            status, _, _ = _post(server, "/v1/pitch" + q, wav)
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 400, q


def test_http_duration_cap_is_413(server):
    # 40000 raw samples @ 16 Hz = 2500 s of audio > the 2048 s largest
    # bucket: must be rejected BEFORE any resample/compile work
    try:
        status, _, body = _post(
            server, "/v1/vad", b"\x00\x00" * 40000,
            content_type="application/octet-stream",
            headers={"X-Sample-Rate": "16"},
        )
    except urllib.error.HTTPError as e:
        status, body = e.code, e.read()
    assert status == 413
    assert b"too long" in body


def test_http_errors_close_the_connection(server):
    """Error paths may leave body bytes unread; the server must close the
    keep-alive connection (advertised via Connection: close) so those bytes
    are never parsed as the next request."""
    import http.client

    host, port = server.server_address[:2]
    conn = http.client.HTTPConnection(host, port, timeout=30)
    try:
        conn.request("POST", "/v1/nope", body=b"leftover-bytes" * 100,
                     headers={"Content-Type": "audio/wav"})
        resp = conn.getresponse()
        assert resp.status == 404
        assert (resp.getheader("Connection") or "").lower() == "close"
        resp.read()
    finally:
        conn.close()
    # and a fresh request still works
    samples, sr = _tone_i16(0.3)
    status, _, _ = _post(server, "/v1/vad", _wav_bytes(samples, sr))
    assert status == 200


def test_decode_rejects_zero_rate_wav():
    # stdlib wave reads a fmt chunk claiming rate 0; must be a decode error
    samples, sr = _tone_i16(0.1)
    wav = bytearray(_wav_bytes(samples, sr))
    assert wav[24:28] == sr.to_bytes(4, "little")
    wav[24:28] = (0).to_bytes(4, "little")  # framerate field
    byte_rate = (sr * 2).to_bytes(4, "little")
    idx = bytes(wav).find(byte_rate)
    if idx >= 0:
        wav[idx : idx + 4] = (0).to_bytes(4, "little")
    with pytest.raises(AudioDecodeError):
        decode_audio(bytes(wav), "audio/wav")


def test_http_pitch_nan_min_confidence_alone_is_400(server):
    samples, sr = _tone_i16(0.3)
    try:
        status, _, _ = _post(
            server, "/v1/pitch?min_confidence=nan", _wav_bytes(samples, sr)
        )
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 400


def test_http_stream_nan_min_confidence_is_400(server):
    """nan parses as a float but gates every frame to f0=0 — reject like
    /v1/pitch does instead of streaming silently-broken output."""
    samples, _ = _tone_i16(0.3)
    for bad in ("nan", "inf", "abc"):
        try:
            status, _, _ = _post(
                server, f"/v1/stream?pitch=1&min_confidence={bad}",
                samples.tobytes(),
                content_type="application/octet-stream",
                headers={"X-Sample-Rate": str(Config.SAMPLE_RATE)},
            )
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 400, bad


def test_http_stream_empty_body_is_400_not_inband(server):
    try:
        status, _, _ = _post(
            server, "/v1/stream", b"",
            content_type="application/octet-stream",
        )
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 400


def test_http_stream_rejects_wav(server):
    samples, sr = _tone_i16(0.3)
    wav = _wav_bytes(samples, sr)
    # honest Content-Type: rejected up front with a real 400
    try:
        status, _, _ = _post(server, "/v1/stream", wav,
                             content_type="audio/wav")
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 400
    # mislabeled RIFF body: sniffed in-band (headers already sent)
    status, _, body = _post(server, "/v1/stream", wav,
                            content_type="application/octet-stream")
    rows = [json.loads(l) for l in body.decode().splitlines() if l.strip()]
    assert any("error" in r and "WAV" in r["error"] for r in rows)


def test_pitch_jit_negative_threshold_keeps_low_confidence_frames():
    """A negative traced threshold must disable confidence gating entirely
    (the inner static gate is -inf, so the outer traced comparison is the
    only confidence gate)."""
    from sspv_tpu.ops.pitch import pitch_track_signal_jit

    rng = np.random.default_rng(3)
    sig = rng.normal(0, 3000, 16000).astype(np.float32)  # aperiodic noise
    n = 1 + (len(sig) - 320) // 160
    vad = np.ones((n,), np.int32)
    fn = pitch_track_signal_jit()
    f0_all, conf = fn(sig, vad, np.float32(-1.0))
    assert (np.asarray(f0_all) > 0).all()  # nothing gated out
    f0_none, _ = fn(sig, vad, np.float32(2.0))
    assert (np.asarray(f0_none) == 0).all()  # conf <= 1 < 2 gates all


def test_snap_to_grid():
    from sspv_tpu.serve import _snap_to_grid

    assert _snap_to_grid(52.0) == 50.0
    assert _snap_to_grid(395.0) == 400.0
    assert _snap_to_grid(-5.0) == 30.0
    with pytest.raises(ValueError):
        _snap_to_grid(float("nan"))


def _stream_request(server, samples, chunk_samples=1000, query=""):
    """Send raw int16 PCM as a chunked POST /v1/stream; return parsed
    NDJSON rows (http.client decodes the chunked response)."""
    import http.client

    host, port = server.server_address[:2]
    conn = http.client.HTTPConnection(host, port, timeout=120)
    try:
        conn.putrequest("POST", "/v1/stream" + query)
        conn.putheader("Content-Type", "application/octet-stream")
        conn.putheader("Transfer-Encoding", "chunked")
        conn.endheaders()
        body = samples.astype("<i2").tobytes()
        step = chunk_samples * 2
        for lo in range(0, len(body), step):
            chunk = body[lo : lo + step]
            conn.send(f"{len(chunk):x}\r\n".encode() + chunk + b"\r\n")
        conn.send(b"0\r\n\r\n")
        resp = conn.getresponse()
        status = resp.status
        lines = [l for l in resp.read().decode().splitlines() if l.strip()]
    finally:
        conn.close()
    return status, [json.loads(l) for l in lines]


def test_http_stream_matches_pipeline_stream(server):
    """Concatenated /v1/stream output must bit-match the offline pipeline
    over the whole signal regardless of client chunking; the server also
    COALESCES tiny client chunks so one client can't force one device
    dispatch per 10 ms chunk."""
    import jax

    samples, _sr = _tone_i16(2.0)
    chunk = 1000
    status, rows = _stream_request(server, samples, chunk_samples=chunk)
    assert status == 200
    assert rows[-1] == {"done": True, "blocks": len(rows) - 1}
    svc = server.RequestHandlerClass.service
    # coalescing: far fewer blocks than the 32 client chunks
    n_client_chunks = -(-len(samples) // chunk)
    assert 0 < len(rows) - 1 < n_client_chunks / 2
    block, _ = svc.pipe.process_signal(samples)
    jax.block_until_ready(block)
    n = sum(r["frames"] for r in rows[:-1])
    got_vad = [v for r in rows[:-1] for v in r["vad"]]
    want_vad = [int(v) for v in np.asarray(block.vad)[:n]]
    assert got_vad == want_vad
    got_e = np.array([v for r in rows[:-1] for v in r["energy"]])
    np.testing.assert_allclose(
        got_e, np.asarray(block.energy)[:n], rtol=1e-6
    )
    assert "mfcc" not in rows[0]


def test_http_stream_pitch_rows(server):
    """/v1/stream?pitch=1 adds per-frame f0 + pitch_confidence from the
    fused streaming program; the concatenated F0 must bit-match the offline
    frames-path track gated on the streamed VAD."""
    from sspv_tpu.ops.pitch import pitch_track

    samples, _sr = _tone_i16(2.0)
    status, rows = _stream_request(
        server, samples, query="?pitch=1&min_confidence=0.4"
    )
    assert status == 200 and rows[-1]["done"] is True
    data = rows[:-1]
    assert all(len(r["f0"]) == r["frames"] for r in data)
    assert all(len(r["pitch_confidence"]) == r["frames"] for r in data)
    svc = server.RequestHandlerClass.service
    vad = np.array([v for r in data for v in r["vad"]], np.int32)
    frames = svc.pipe.stream_frames(samples)[: vad.shape[0]]
    want_f0, _ = pitch_track(frames, vad, min_confidence=0.4, acf_impl="dft")
    got_f0 = np.array([v for r in data for v in r["f0"]], np.float32)
    np.testing.assert_array_equal(got_f0, np.asarray(want_f0))
    assert (got_f0 > 0).any()
    # plain stream rows must not carry pitch fields
    status, rows2 = _stream_request(server, samples[:16000])
    assert status == 200 and "f0" not in rows2[0]


def test_http_stream_mfcc_and_single_body(server):
    samples, sr = _tone_i16(0.8)
    # non-chunked clients: one Content-Length body, still NDJSON out
    status, _, body = _post(
        server, "/v1/stream?mfcc=1", samples.tobytes(),
        content_type="application/octet-stream",
        headers={"X-Sample-Rate": str(sr)},
    )
    assert status == 200
    rows = [json.loads(l) for l in body.decode().splitlines() if l.strip()]
    assert rows[-1]["done"] is True
    assert len(rows[0]["mfcc"]) == rows[0]["frames"]


def test_http_stream_rejects_foreign_rate(server):
    samples, _ = _tone_i16(0.3)
    try:
        status, _, _ = _post(
            server, "/v1/stream", samples.tobytes(),
            content_type="application/octet-stream",
            headers={"X-Sample-Rate": "8000"},
        )
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 400


def test_http_concurrent_clients_share_one_pipeline(server):
    """8 concurrent clients, mixed endpoints; every response must equal the
    serial result (stateless requests over one shared pipeline)."""
    samples, sr = _tone_i16(1.5)
    wav = _wav_bytes(samples, sr)
    svc = server.RequestHandlerClass.service
    expect = svc.analyze(samples, sr)

    results: list = [None] * 8
    def worker(i):
        path = "/v1/features" if i % 2 else "/v1/vad"
        status, _, body = _post(server, path, wav)
        results[i] = (status, json.loads(body))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    for i, r in enumerate(results):
        assert r is not None, f"client {i} hung"
        status, res = r
        assert status == 200
        np.testing.assert_array_equal(np.asarray(res["vad"]), expect["vad"])


def test_warmup_all_buckets_compiles_each_bucket(monkeypatch):
    svc = FeatureService()
    seen = []
    real = svc.analyze
    monkeypatch.setattr(
        svc, "analyze", lambda sig, sr, **kw: seen.append(len(sig)) or real(
            sig[: Config.SAMPLE_RATE * 2], sr, **kw
        )
    )
    svc.warmup(all_buckets=True)
    # two analyze calls per bucket: the plain masked program (features/vad
    # routes) and the fused features+pitch program (pitch route)
    assert seen == [
        s * Config.SAMPLE_RATE
        for s in svc.pipe.SIGNAL_BUCKET_SECONDS for _ in (0, 1)
    ]
    seen.clear()
    svc.warmup()
    assert seen == [svc.pipe.SIGNAL_BUCKET_SECONDS[0] * Config.SAMPLE_RATE] * 2


def test_pitch_band_routing_fused_vs_two_call(monkeypatch):
    """Default-band pitch requests must ride the fused single-dispatch
    program (the warmed one); custom bands must stay on the two-call path
    (warm feature program + small cached pitch-track compile) so a custom
    band never cold-compiles the whole fused pipeline. Both must produce
    identical results."""
    svc = FeatureService()
    calls = []
    real_fused = svc.pipe.process_signal_pitch_auto
    real_auto = svc.pipe.process_signal_auto
    real_pitch = svc.pipe.pitch_signal_auto
    monkeypatch.setattr(
        svc.pipe, "process_signal_pitch_auto",
        lambda *a, **k: calls.append("fused") or real_fused(*a, **k),
    )
    monkeypatch.setattr(
        svc.pipe, "process_signal_auto",
        lambda *a, **k: calls.append("auto") or real_auto(*a, **k),
    )
    monkeypatch.setattr(
        svc.pipe, "pitch_signal_auto",
        lambda *a, **k: calls.append("pitch") or real_pitch(*a, **k),
    )
    t = np.arange(Config.SAMPLE_RATE) / Config.SAMPLE_RATE
    sig = (5000 * np.sin(2 * np.pi * 150 * t)).astype(np.int16)

    out_d = svc.analyze(sig, Config.SAMPLE_RATE, want_pitch=True)
    assert calls == ["fused"]
    calls.clear()
    out_c = svc.analyze(
        sig, Config.SAMPLE_RATE, want_pitch=True, fmin=80.0, fmax=300.0
    )
    assert calls == ["auto", "pitch"]
    # both bands agree on the obvious 150 Hz tone
    for out in (out_d, out_c):
        f0 = np.asarray(out["f0"])
        v = f0[f0 > 0]
        assert v.size and abs(np.median(v) - 150) < 10


def test_http_infeasible_pitch_band_is_400(server):
    """fmin/fmax pairs from the grid that leave no lag band for the frame
    geometry (e.g. 30..50 Hz needs lag 320 > 319) must be a 400, not a
    trace-time crash."""
    samples, sr = _tone_i16(0.3)
    try:
        status, _, body = _post(
            server, "/v1/pitch?fmin=30&fmax=50", _wav_bytes(samples, sr)
        )
    except urllib.error.HTTPError as e:
        status, body = e.code, e.read()
    assert status == 400
    assert b"lag band" in body


def test_decode_wav_32bit_matches_file_ladder_on_negatives():
    """32-bit scaling must be an arithmetic shift (>>16, floor) like the
    FileAudioSource ladder — a float divide-then-truncate disagrees by one
    LSB on negative samples that aren't multiples of 65536."""
    buf = io.BytesIO()
    raw = np.array([-65537, -1, 65535, 65537], dtype="<i4")
    with wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(4); w.setframerate(16000)
        w.writeframes(raw.tobytes())
    out, _ = decode_audio(buf.getvalue(), "audio/wav")
    np.testing.assert_array_equal(out, raw >> 16)


def test_http_stream_negative_chunk_size_is_rejected(server):
    """A negative chunked-encoding size must not read to EOF (it would
    buffer unbounded data past the body cap)."""
    import http.client

    host, port = server.server_address[:2]
    conn = http.client.HTTPConnection(host, port, timeout=30)
    try:
        conn.putrequest("POST", "/v1/stream")
        conn.putheader("Content-Type", "application/octet-stream")
        conn.putheader("Transfer-Encoding", "chunked")
        conn.endheaders()
        conn.send(b"-5\r\n" + b"x" * 64 + b"\r\n0\r\n\r\n")
        resp = conn.getresponse()
        body = resp.read().decode()
    finally:
        conn.close()
    assert "negative chunk size" in body


def test_http_stream_trailer_flood_is_bounded(server):
    """Endless trailer lines after the terminal chunk must error out, not
    pin the handler thread forever."""
    import http.client

    host, port = server.server_address[:2]
    conn = http.client.HTTPConnection(host, port, timeout=30)
    try:
        conn.putrequest("POST", "/v1/stream")
        conn.putheader("Content-Type", "application/octet-stream")
        conn.putheader("Transfer-Encoding", "chunked")
        conn.endheaders()
        conn.send(b"0\r\n" + b"x: y\r\n" * 500)  # never sends the blank line
        resp = conn.getresponse()
        body = resp.read().decode()
    finally:
        conn.close()
    assert "too many trailer lines" in body


def test_http_pitch_negative_min_confidence_disables_gating(server):
    """min_confidence=-1 must pass through (library semantics: negative
    threshold keeps every VAD-voiced frame), not clamp to 0."""
    samples, sr = _tone_i16(1.0)
    status, _, strict = _post(
        server, "/v1/pitch?min_confidence=0.99", _wav_bytes(samples, sr)
    )
    assert status == 200
    status, _, permissive = _post(
        server, "/v1/pitch?min_confidence=-1", _wav_bytes(samples, sr)
    )
    assert status == 200
    n_strict = sum(1 for v in json.loads(strict)["f0"] if v > 0)
    n_perm = sum(1 for v in json.loads(permissive)["f0"] if v > 0)
    assert n_perm >= n_strict
    # permissive keeps every VAD-voiced frame
    vad = json.loads(permissive)["vad"]
    f0 = json.loads(permissive)["f0"]
    assert all((f > 0) == bool(v) for f, v in zip(f0, vad))


def test_healthz_probes_the_device(server):
    """/healthz must dispatch a bounded device op (cached), not just read
    the client-cached device list."""
    from sspv_tpu.serve import _PROBE_STATE

    status, health = _get(server, "/healthz")
    assert status == 200
    assert health["status"] == "ok"
    assert _PROBE_STATE["ok"] is True  # a real probe ran and was cached


def test_metrics_endpoint_counts_requests(server):
    """GET /metrics reflects requests made on this server: per-route
    counters, error counts, latency quantiles, and body/frame totals."""
    from sspv_tpu.serve import _METRICS

    before = _METRICS.snapshot()
    samples, sr = _tone_i16(1.0)
    wav = _wav_bytes(samples, sr)
    status, _ct, body = _post(server, "/v1/features", wav)
    assert status == 200
    n_frames = json.loads(body)["num_frames"]
    with pytest.raises(urllib.error.HTTPError):
        _post(server, "/v1/features", b"not audio at all")

    host, port = server.server_address[:2]
    b = before["routes"].get(
        "/v1/features",
        {"requests": 0, "errors": 0},
    )
    # a request is observed in the handler's finally AFTER the client has
    # the full response, so accounting trails the client by a few µs —
    # poll briefly instead of racing it
    deadline = time.monotonic() + 5.0
    while True:
        m = json.load(urllib.request.urlopen(
            f"http://{host}:{port}/metrics", timeout=60
        ))
        r = m["routes"].get("/v1/features", {"requests": 0})
        if r["requests"] >= b["requests"] + 2 or time.monotonic() > deadline:
            break
        time.sleep(0.05)
    assert r["requests"] == b["requests"] + 2
    assert r["errors"] == b["errors"] + 1
    assert r["latency_p50_s"] > 0 and r["latency_max_s"] >= r["latency_p50_s"]
    assert m["bytes_in_total"] >= before["bytes_in_total"] + len(wav)
    assert m["frames_out_total"] >= before["frames_out_total"] + n_frames
    assert m["inflight"] >= 1  # this very /metrics request


def test_metrics_prometheus_exposition(server):
    host, port = server.server_address[:2]
    urllib.request.urlopen(f"http://{host}:{port}/healthz", timeout=60)
    resp = urllib.request.urlopen(
        f"http://{host}:{port}/metrics?fmt=prom", timeout=60
    )
    assert resp.headers["Content-Type"].startswith("text/plain")
    text = resp.read().decode()
    assert 'sspv_requests_total{route="/healthz"}' in text
    assert "# TYPE sspv_request_latency_seconds summary" in text
    assert "sspv_uptime_seconds" in text


def test_metrics_unknown_routes_fold_into_other(server):
    """Scanning random URLs must not grow metric label cardinality."""
    from sspv_tpu.serve import _METRICS

    host, port = server.server_address[:2]
    for k in range(3):
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(
                f"http://{host}:{port}/scan/{k}", timeout=60
            )
    # accounting trails the client's view of the response (observed in the
    # handler's finally) — poll briefly instead of racing it
    deadline = time.monotonic() + 5.0
    while True:
        snap = _METRICS.snapshot()
        settled = (
            snap["routes"].get("other", {"errors": 0})["errors"] >= 3
            and snap["inflight"] == 0
        )
        if settled or time.monotonic() > deadline:
            break
        time.sleep(0.05)
    assert "other" in snap["routes"]
    assert snap["routes"]["other"]["errors"] >= 3
    assert not any(r.startswith("/scan") for r in snap["routes"])
    assert snap["inflight"] == 0  # every finished request decremented


def test_sigterm_drains_and_exits_cleanly(tmp_path):
    """python -m sspv_tpu.serve must exit 0 on SIGTERM after draining
    (rolling-deploy contract)."""
    import os
    import signal
    import subprocess
    import sys
    import time

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ, PYTHONPATH=root, JAX_PLATFORMS="cpu",
        RTP_SERVE_HOST="127.0.0.1", RTP_SERVE_PORT="0",
        RTP_SERVE_WARMUP="0", RTP_SERVE_DRAIN_S="10",
    )
    proc = subprocess.Popen(
        [sys.executable, "-m", "sspv_tpu.serve"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        deadline = time.time() + 120
        port = None
        for line in proc.stdout:
            if "serving on http://" in line:
                port = int(line.rsplit(":", 1)[1])
                break
            assert time.time() < deadline, "server never came up"
        assert port
        urllib.request.urlopen(
            f"http://127.0.0.1:{port}/config", timeout=60
        ).read()
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=60)
        assert rc == 0
    finally:
        if proc.poll() is None:
            proc.kill()
