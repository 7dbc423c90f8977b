#!/usr/bin/env python3
"""Batch corpus processor: many audio files through the mesh-sharded pipeline.

The reference processes one stream at a time (a desktop app); this is the
offline production counterpart the TPU rebuild adds: walk files/directories,
decode on host threads, group files into equal-shape device batches, and run
each batch through ``parallel.BatchPipeline.process_batch_masked`` — a (B, L)
zero-padded batch with B sharded over the mesh's "data" axis, every file
carrying its own VAD state, padded frames masked out. File lengths pad up to
``FeaturePipeline.SIGNAL_BUCKET_SECONDS`` buckets so an arbitrary corpus
compiles a handful of programs (one per (batch, bucket) shape).

On a single chip the same code runs with a 1-device mesh (the batch still
amortizes dispatch overhead across files); on a pod slice the "data" axis
fans out with zero cross-device communication (SURVEY.md §7 design stance).

Usage:
    python -m sspv_tpu.batch INPUT... [--out-dir DIR] [--batch 8]
        [--pitch] [--jsonl SUMMARY.jsonl] [--no-npz]

Prints one JSON summary line per file (same fields as ``sspv_tpu.analyze``)
plus a final aggregate line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from .config import Config

__all__ = ["collect_inputs", "process_corpus", "main"]


def collect_inputs(paths: list[str]) -> list[str]:
    """Expand files/directories into a sorted list of supported audio files."""
    from .runtime.audio_source import SUPPORTED_EXTENSIONS

    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, names in os.walk(p):
                for name in sorted(names):
                    if os.path.splitext(name)[1].lower() in SUPPORTED_EXTENSIONS:
                        out.append(os.path.join(root, name))
        elif os.path.isfile(p):
            out.append(p)
        else:
            raise FileNotFoundError(p)
    return sorted(dict.fromkeys(out))


def _decode(path: str) -> np.ndarray:
    """Decode one file to int16 samples at the model rate (same ladder as
    the streaming engine's FileAudioSource)."""
    from .runtime.audio_source import FileAudioSource

    src = FileAudioSource(path, sample_rate=Config.SAMPLE_RATE)
    src.open()
    pcm = src.read(1 << 62)
    src.close()
    return np.asarray(pcm, dtype=np.int16)


def _bucket_len(num_samples: int, buckets_seconds, sample_rate: int) -> int | None:
    for s in buckets_seconds:
        if num_samples <= s * sample_rate:
            return s * sample_rate
    return None  # beyond the largest bucket


def _summarize(path: str, pcm_len: int, sl: dict) -> dict:
    vad = sl["vad"]
    f0 = sl.get("f0")
    voiced_f0 = f0[f0 > 0] if f0 is not None else np.zeros(0)
    summary = {
        "file": path,
        "duration_s": round(pcm_len / Config.SAMPLE_RATE, 3),
        "frames": int(vad.shape[0]),
        "voiced_frames": int(vad.sum()),
        "voiced_pct": round(float(vad.mean()) * 100, 1) if vad.size else 0.0,
        "mean_energy": float(sl["energy"].mean()) if vad.size else 0.0,
        "mean_zcr": round(float(sl["zcr"].mean()), 4) if vad.size else 0.0,
        "mean_entropy": round(float(sl["entropy"].mean()), 3) if vad.size else 0.0,
    }
    if f0 is not None:
        summary["median_f0_hz"] = (
            round(float(np.median(voiced_f0)), 1) if voiced_f0.size else None
        )
    return summary


def _unique_npz_path(out_dir: str, path: str, used: set) -> str:
    """Collision-proof output name: a recursive corpus walk can hold several
    same-named files (sess1/take.wav, sess2/take.wav); basename-only output
    would silently overwrite. Deterministic given input order."""
    base = os.path.splitext(os.path.basename(path))[0]
    name, k = base, 1
    while name in used:
        k += 1
        name = f"{base}_{k}"
    used.add(name)
    return os.path.join(out_dir, name + ".npz")


def process_corpus(
    files: list[str],
    out_dir: str | None = None,
    batch_size: int = 8,
    want_pitch: bool = False,
    decode_workers: int = 4,
    mesh=None,
    files_per_pass: int = 256,
) -> list[dict]:
    """Process ``files``; returns one summary dict per file (input order).

    Files are decoded in windows of ``files_per_pass`` (bounded host
    memory: one window of PCM plus one batch of features in flight, so a
    10k-file corpus never materializes at once), grouped by signal bucket
    within each window, stacked into (B, L) masked batches (B padded to a
    mesh-divisible size with zero-length rows), and each batch is one
    sharded device call. Feature npz files are written as each file
    completes. Oversized files (beyond the largest bucket) fall back to
    the scan-based long-signal path individually.
    """
    import jax

    from .ops.pipeline import FeatureConfig, FeaturePipeline
    from .parallel import BatchPipeline, make_mesh

    mesh = mesh or make_mesh()
    bp = BatchPipeline(mesh, FeatureConfig.from_config(Config))
    pipe: FeaturePipeline = bp.pipe
    c = pipe.cfg
    dp = mesh.devices.shape[0]
    buckets = pipe.SIGNAL_BUCKET_SECONDS

    def slice_block(block, row: int | None, n: int) -> dict:
        pick = (lambda x: x[row][:n]) if row is not None else (lambda x: x[:n])
        return {
            "energy": np.asarray(pick(block.energy)),
            "zcr": np.asarray(pick(block.zcr)),
            "entropy": np.asarray(pick(block.entropy)),
            "mfcc": np.asarray(pick(block.mfcc)),
            "vad": np.asarray(pick(block.vad)).astype(np.int32),
            "vad_adaptive": np.asarray(pick(block.vad_adaptive)).astype(np.int32),
        }

    def add_pitch(sl: dict, sig: np.ndarray, _target=None) -> None:
        sl["f0"], sl["pitch_confidence"] = pipe.pitch_signal_auto(
            sig, sl["vad"]
        )

    used_names: set = set()

    def finish(i: int, path: str, pcm_len: int, sl: dict) -> None:
        """Summarize + write npz immediately so feature arrays free per file."""
        summary = _summarize(path, pcm_len, sl)
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            npz_path = _unique_npz_path(out_dir, path, used_names)
            np.savez(
                npz_path,
                energies=sl["energy"].astype(np.float64),
                zcrs=sl["zcr"].astype(np.float64),
                vads=sl["vad"].astype(np.int32),
                spec_entropy=sl["entropy"].astype(np.float32),
                vads_adaptive=sl["vad_adaptive"].astype(np.float32),
                mfcc=sl["mfcc"].astype(np.float32),
                **(
                    {"f0": sl["f0"].astype(np.float32)}
                    if "f0" in sl else {}
                ),
                sample_rate=np.int32(c.sample_rate),
                frame_size=np.int32(c.frame_size),
                hop_size=np.int32(c.hop_size),
            )
            summary["npz"] = npz_path
        summaries[i] = summary

    summaries: list = [None] * len(files)
    for wlo in range(0, len(files), files_per_pass):
        window = list(range(wlo, min(wlo + files_per_pass, len(files))))
        with ThreadPoolExecutor(max_workers=decode_workers) as pool:
            signals = dict(zip(window, pool.map(
                _decode, (files[i] for i in window)
            )))

        # group this window's file indices by padded bucket length
        groups: dict[int | None, list[int]] = {}
        for i in window:
            groups.setdefault(
                _bucket_len(len(signals[i]), buckets, c.sample_rate), []
            ).append(i)

        for target, idxs in groups.items():
            if target is None:  # huge files: individual scan-path calls
                for i in idxs:
                    sig = signals[i]  # int16: half the bytes, cast on device
                    block, _ = pipe.process_signal_auto(sig)
                    jax.block_until_ready(block)
                    n = int(np.asarray(block.vad).shape[0])
                    sl = slice_block(block, None, n)
                    if want_pitch:
                        add_pitch(sl, sig, None)
                    finish(i, files[i], len(sig), sl)
                continue
            for lo in range(0, len(idxs), batch_size):
                chunk = idxs[lo : lo + batch_size]
                b = len(chunk)
                b_pad = -(-b // dp) * dp  # round up to a mesh-divisible batch
                batch = np.zeros((b_pad, target), np.int16)
                lengths = np.zeros((b_pad,), np.int32)
                for row, i in enumerate(chunk):
                    sig = signals[i]
                    batch[row, : len(sig)] = sig
                    lengths[row] = len(sig)
                block, _ = bp.process_batch_masked(batch, lengths)
                jax.block_until_ready(block)
                n_max = int(np.asarray(block.vad).shape[1])
                for row, i in enumerate(chunk):
                    L = int(lengths[row])
                    n = (
                        1 + (L - c.frame_size) // c.hop_size
                        if L >= c.frame_size else 0
                    )
                    n = min(n, n_max)
                    sl = slice_block(block, row, n)
                    if want_pitch:
                        add_pitch(sl, batch[row], target)
                    finish(i, files[i], L, sl)
        signals.clear()

    assert all(s is not None for s in summaries)
    return summaries


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("inputs", nargs="+", help="audio files or directories")
    parser.add_argument("--out-dir", help="write per-file feature npz here")
    parser.add_argument("--jsonl", help="also append summaries to this JSONL")
    parser.add_argument("--batch", type=int, default=8,
                        help="max files per device batch")
    parser.add_argument("--pitch", action="store_true",
                        help="also compute the VAD-gated F0 track")
    parser.add_argument("--no-npz", action="store_true",
                        help="summaries only, no feature export")
    args = parser.parse_args(argv)

    Config.setup_logging()
    Config.load_from_env()
    Config.setup_logging()  # re-apply a LOG_LEVEL override
    from .utils.cache import enable_persistent_cache

    enable_persistent_cache()
    files = collect_inputs(args.inputs)
    if not files:
        print(json.dumps({"error": "no supported audio files found"}))
        return 1
    t0 = time.time()
    out_dir = None if args.no_npz else (args.out_dir or ".")
    summaries = process_corpus(
        files, out_dir=out_dir, batch_size=args.batch, want_pitch=args.pitch
    )
    wall = time.time() - t0
    sink = open(args.jsonl, "a", encoding="utf-8") if args.jsonl else None
    try:
        for s in summaries:
            line = json.dumps(s)
            print(line)
            if sink:
                sink.write(line + "\n")
    finally:
        if sink:
            sink.close()
    total_audio = sum(s["duration_s"] for s in summaries)
    print(json.dumps({
        "files": len(summaries),
        "audio_s": round(total_audio, 1),
        "wall_s": round(wall, 2),
        "audio_s_per_s": round(total_audio / wall, 1) if wall else None,
    }), file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
