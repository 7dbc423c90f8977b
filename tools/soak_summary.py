#!/usr/bin/env python3
"""Summarize a soak log (examples/soak.py output): steady-state RSS slope,
frame-flow stability, and error count.

    python tools/soak_summary.py docs/soak_tpu_r2.log [--steady-after SECONDS]

Steady state defaults to "after the first sample with frames flowing plus
120 s" (skips the remote-compile warm-up). RSS slope is a least-squares fit
over the steady window.
"""

from __future__ import annotations

import re
import sys

import numpy as np

LINE = re.compile(
    r"t=\s*([0-9.]+)s rss=\s*([0-9.]+)MB recent_frames=(\d+) voiced=(\d+) err=(\S+)"
)


def main(argv) -> int:
    path = argv[0]
    steady_after = None
    if "--steady-after" in argv:
        steady_after = float(argv[argv.index("--steady-after") + 1])

    t, rss, frames, errs = [], [], [], 0
    verdict = None
    for line in open(path):
        m = LINE.search(line)
        if m:
            t.append(float(m.group(1)))
            rss.append(float(m.group(2)))
            frames.append(int(m.group(3)))
            if m.group(5) != "None":
                errs += 1
        elif line.startswith("soak:"):
            verdict = line.split()[-1]
    t, rss, frames = map(np.asarray, (t, rss, frames))
    if t.size < 3:
        print("not enough samples")
        return 1

    flowing = np.nonzero(frames > 0)[0]
    first_flow = t[flowing[0]] if flowing.size else float("inf")
    if steady_after is None:
        steady_after = first_flow + 120.0
    sel = t >= steady_after
    if sel.sum() < 3:
        sel = slice(len(t) // 2, None)

    ts, rs, fs = t[sel], rss[sel], frames[sel]
    slope = np.polyfit(ts, rs, 1)[0]  # MB/s
    print(f"samples:            {t.size} over {t[-1]:.0f} s")
    print(f"first frames at:    t={first_flow:.0f} s (cold compile warm-up)")
    print(f"steady window:      t>={steady_after:.0f} s ({ts.size} samples)")
    print(f"RSS start/end:      {rs[0]:.1f} -> {rs[-1]:.1f} MB")
    print(f"RSS slope (steady): {slope*3600:.1f} MB/h ({slope*1000:.2f} KB/s)")
    print(f"frames flowing:     {int((fs > 0).sum())}/{fs.size} steady samples")
    print(f"errors:             {errs}")
    if verdict:
        print(f"verdict:            {verdict}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
