#!/usr/bin/env python3
"""Batch corpus processor: masked mesh batches must reproduce the
single-file path exactly, per-file npz/JSONL outputs must land, and the
CLI must run end-to-end."""

import json
import os
import subprocess
import sys
import wave

import numpy as np

from sspv_tpu.config import Config

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_wav(path, duration_s, freq):
    sr = Config.SAMPLE_RATE
    t = np.arange(int(duration_s * sr)) / sr
    sig = np.zeros_like(t)
    lo, hi = len(t) // 4, 3 * len(t) // 4
    sig[lo:hi] = np.sin(2 * np.pi * freq * t[lo:hi]) * 8000
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(sig.astype("<i2").tobytes())
    return str(path)


def _corpus(tmp_path):
    return [
        _write_wav(tmp_path / "a_short.wav", 0.7, 110.0),
        _write_wav(tmp_path / "b_mid.wav", 1.9, 160.0),
        _write_wav(tmp_path / "c_longer.wav", 3.1, 220.0),  # next bucket
        _write_wav(tmp_path / "d_tiny.wav", 0.3, 130.0),
    ]


def test_process_corpus_matches_single_file_path(tmp_path):
    from sspv_tpu.batch import process_corpus
    from sspv_tpu.ops.pipeline import FeatureConfig, FeaturePipeline
    from sspv_tpu.runtime.audio_source import FileAudioSource

    files = _corpus(tmp_path)
    out = tmp_path / "out"
    summaries = process_corpus(files, out_dir=str(out), batch_size=3,
                               want_pitch=True)
    assert [s["file"] for s in summaries] == files

    pipe = FeaturePipeline(FeatureConfig.from_config(Config))
    for path, s in zip(files, summaries):
        src = FileAudioSource(path, sample_rate=Config.SAMPLE_RATE)
        src.open()
        pcm = src.read(1 << 62)
        src.close()
        block, _ = pipe.process_signal_auto(np.asarray(pcm, np.float32))
        vad = np.asarray(block.vad)
        assert s["frames"] == vad.shape[0]
        assert s["voiced_frames"] == int(vad.sum())
        with np.load(s["npz"]) as z:
            np.testing.assert_array_equal(z["vads"], vad.astype(np.int32))
            np.testing.assert_allclose(
                z["energies"], np.asarray(block.energy, np.float64),
                rtol=1e-6,
            )
            # the masked-batch path materializes frames while
            # process_signal_auto uses the signal-view matmuls: same oracle
            # gate, different reduction order -> float32 reassociation noise
            np.testing.assert_allclose(
                z["mfcc"], np.asarray(block.mfcc, np.float32),
                atol=1e-3, rtol=1e-4,
            )
            assert z["f0"].shape == vad.shape
            assert z["pitch_confidence"].shape == vad.shape


def test_process_corpus_pitch_tracks_tones(tmp_path):
    from sspv_tpu.batch import process_corpus

    files = [
        _write_wav(tmp_path / "t100.wav", 1.5, 100.0),
        _write_wav(tmp_path / "t200.wav", 1.5, 200.0),
    ]
    summaries = process_corpus(files, out_dir=None, want_pitch=True)
    assert abs(summaries[0]["median_f0_hz"] - 100.0) < 5
    assert abs(summaries[1]["median_f0_hz"] - 200.0) < 8


def test_process_corpus_pure_dp_mesh_matches(tmp_path):
    """dp=8 (every device its own file) must give the same answers as the
    default dp=2/seq=4 mesh — results are mesh-shape-invariant."""
    from sspv_tpu.batch import process_corpus
    from sspv_tpu.parallel import make_mesh

    files = _corpus(tmp_path)
    a = process_corpus(files, out_dir=None, batch_size=8)
    b = process_corpus(files, out_dir=None, batch_size=8,
                       mesh=make_mesh(8, dp=8))
    for sa, sb in zip(a, b):
        assert sa == sb


def test_collect_inputs_walks_and_dedupes(tmp_path):
    from sspv_tpu.batch import collect_inputs

    files = _corpus(tmp_path)
    (tmp_path / "sub").mkdir()
    _write_wav(tmp_path / "sub" / "e.wav", 0.4, 150.0)
    (tmp_path / "notes.txt").write_text("not audio")
    got = collect_inputs([str(tmp_path), files[0]])
    assert len(got) == 5  # 4 + sub/e.wav, txt skipped, no dup of files[0]
    assert all(g.endswith(".wav") for g in got)


def test_batch_cli_end_to_end(tmp_path):
    files = _corpus(tmp_path)
    out = tmp_path / "cli_out"
    jsonl = tmp_path / "summaries.jsonl"
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "sspv_tpu.batch", str(tmp_path),
         "--out-dir", str(out), "--jsonl", str(jsonl), "--batch", "2"],
        capture_output=True, text=True, timeout=600, env=env, cwd=ROOT,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    lines = [json.loads(l) for l in r.stdout.splitlines() if l.strip()]
    assert len(lines) == len(files)
    agg = json.loads(r.stderr.splitlines()[-1])
    assert agg["files"] == len(files)
    assert os.path.exists(out / "a_short.npz")
    assert len(jsonl.read_text().splitlines()) == len(files)


def test_npz_names_never_collide(tmp_path):
    """Same-named files in different directories must not overwrite each
    other's feature exports."""
    from sspv_tpu.batch import process_corpus

    (tmp_path / "s1").mkdir()
    (tmp_path / "s2").mkdir()
    f1 = _write_wav(tmp_path / "s1" / "take.wav", 0.5, 100.0)
    f2 = _write_wav(tmp_path / "s2" / "take.wav", 0.5, 220.0)
    out = tmp_path / "out"
    summaries = process_corpus([f1, f2], out_dir=str(out))
    paths = [s["npz"] for s in summaries]
    assert len(set(paths)) == 2
    assert all(os.path.exists(p) for p in paths)
    # and the contents really are per-file (different tones -> different zcr)
    with np.load(paths[0]) as a, np.load(paths[1]) as b:
        assert not np.array_equal(a["zcrs"], b["zcrs"])


def test_windowed_passes_match_single_pass(tmp_path):
    """files_per_pass=2 over 4 files must reproduce the one-pass result
    (bounded-memory windowing is an implementation detail, not semantics)."""
    from sspv_tpu.batch import process_corpus

    files = _corpus(tmp_path)
    a = process_corpus(files, out_dir=None, files_per_pass=2)
    b = process_corpus(files, out_dir=None, files_per_pass=256)
    assert a == b


def test_undecodable_file_yields_error_summary(tmp_path):
    """One corrupt file must not abort the corpus: it gets an error summary,
    every other file is processed normally."""
    from sspv_tpu.batch import process_corpus

    _write_wav(tmp_path / "good1.wav", 0.5, 150.0)
    (tmp_path / "bad.wav").write_bytes(b"RIFFgarbage-not-audio")
    _write_wav(tmp_path / "good2.wav", 0.4, 200.0)
    files = sorted(str(p) for p in tmp_path.glob("*.wav"))
    summaries = process_corpus(files, out_dir=None)
    by_name = {s["file"]: s for s in summaries}
    assert "error" in by_name[str(tmp_path / "bad.wav")]
    for good in ("good1.wav", "good2.wav"):
        s = by_name[str(tmp_path / good)]
        assert "error" not in s and s["frames"] > 0


def test_ragged_tails_share_one_program(tmp_path, monkeypatch):
    """Every batch pads to the FULL (mesh-divisible) batch size, so ragged
    tails (here 5 files -> 4 + 1 with batch_size=4) reuse ONE compiled
    (B, bucket) shape instead of one program per tail size."""
    import sspv_tpu.parallel as par
    from sspv_tpu.batch import process_corpus

    for k in range(5):
        _write_wav(tmp_path / f"t{k}.wav", 0.3, 120.0 + 10 * k)
    files = sorted(str(p) for p in tmp_path.glob("*.wav"))

    created = []
    orig = par.BatchPipeline

    class Capture(orig):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            created.append(self)

    monkeypatch.setattr(par, "BatchPipeline", Capture)
    summaries = process_corpus(files, out_dir=None, batch_size=4)
    assert all("error" not in s and s["frames"] > 0 for s in summaries)
    (bp,) = created
    masked_keys = [k for k in bp._batch_jit if k[0] == "batch_masked"]
    assert len(masked_keys) == 1, masked_keys


def _count_decodes(monkeypatch):
    """Patch the decode ladder to count how many files this run decodes."""
    import sspv_tpu.batch as batch_mod

    calls = []
    orig = batch_mod._decode
    monkeypatch.setattr(
        batch_mod, "_decode", lambda p: (calls.append(p), orig(p))[1]
    )
    return calls


def test_resume_skips_completed_files(tmp_path, monkeypatch):
    """A resumed run must not re-decode or re-process checkpointed files:
    their summaries come back from the manifest (marked resumed) and their
    npz exports are untouched."""
    from sspv_tpu.batch import process_corpus

    files = _corpus(tmp_path)
    manifest = str(tmp_path / "manifest.jsonl")
    out_dir = str(tmp_path / "out")
    first = process_corpus(files, out_dir=out_dir, manifest=manifest)
    assert all("error" not in s for s in first)
    mtimes = {s["npz"]: os.path.getmtime(s["npz"]) for s in first}

    calls = _count_decodes(monkeypatch)
    second = process_corpus(
        files, out_dir=out_dir, manifest=manifest, resume=True
    )
    assert calls == []  # nothing re-decoded
    for a, b in zip(first, second):
        assert b.pop("resumed") is True
        assert a == b
    for p, m in mtimes.items():
        assert os.path.getmtime(p) == m  # exports untouched


def test_resume_retries_errors_and_lost_npz(tmp_path, monkeypatch):
    """Resume reprocesses exactly the files that still need work: a
    previously errored file (now fixed) and a file whose npz vanished."""
    from sspv_tpu.batch import process_corpus

    good = _write_wav(tmp_path / "good.wav", 0.5, 150.0)
    other = _write_wav(tmp_path / "other.wav", 0.6, 200.0)
    bad = str(tmp_path / "bad.wav")
    open(bad, "wb").write(b"RIFFgarbage")
    files = sorted([good, other, bad])
    manifest = str(tmp_path / "m.jsonl")
    out_dir = str(tmp_path / "out")
    first = process_corpus(files, out_dir=out_dir, manifest=manifest)
    assert sum("error" in s for s in first) == 1

    _write_wav(bad, 0.4, 120.0)  # the operator fixed the corrupt file
    lost = next(s["npz"] for s in first if s["file"] == good)
    os.remove(lost)

    calls = _count_decodes(monkeypatch)
    second = process_corpus(
        files, out_dir=out_dir, manifest=manifest, resume=True
    )
    assert sorted(calls) == sorted([bad, good])
    by = {s["file"]: s for s in second}
    assert "error" not in by[bad] and not by[bad].get("resumed")
    assert os.path.exists(by[good]["npz"])  # re-exported
    assert by[other].get("resumed") is True


def test_resume_tolerates_torn_manifest_line(tmp_path):
    """A crash mid-append leaves a torn final JSON line; resume must skip
    it and reprocess that file rather than fail."""
    from sspv_tpu.batch import process_corpus

    files = _corpus(tmp_path)[:2]
    manifest = str(tmp_path / "m.jsonl")
    process_corpus(files, out_dir=None, manifest=manifest)
    lines = open(manifest).read().splitlines()
    open(manifest, "w").write(lines[0] + "\n" + lines[1][: len(lines[1]) // 2])
    out = process_corpus(files, out_dir=None, manifest=manifest, resume=True)
    assert out[0].get("resumed") is True
    assert "resumed" not in out[1] and out[1]["frames"] > 0


def test_resume_reprocesses_for_pitch_upgrade(tmp_path):
    """A checkpoint written without pitch cannot satisfy a want_pitch run."""
    from sspv_tpu.batch import process_corpus

    files = _corpus(tmp_path)[:2]
    manifest = str(tmp_path / "m.jsonl")
    process_corpus(files, out_dir=None, manifest=manifest)
    out = process_corpus(
        files, out_dir=None, manifest=manifest, resume=True, want_pitch=True
    )
    assert all("median_f0_hz" in s and not s.get("resumed") for s in out)


def test_resume_requires_manifest():
    from sspv_tpu.batch import process_corpus

    import pytest

    with pytest.raises(ValueError, match="manifest"):
        process_corpus(["x.wav"], resume=True)
