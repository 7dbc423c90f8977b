# Deep fuzz: N random VAD configs + M random geometries vs oracle.
# Usage: python tools/deep_fuzz.py [n_vad=300] [n_geom=60]
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import sys
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT); sys.path.insert(0, os.path.join(_ROOT, "tests"))
import jax
jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge as xb; xb._clear_backends()
import numpy as np
import jax.numpy as jnp
from sspv_tpu.ops import vad as vad_ops
import oracle

N_VAD = int(sys.argv[1]) if len(sys.argv) > 1 else 300
N_GEOM = int(sys.argv[2]) if len(sys.argv) > 2 else 60

fails = 0
for seed in range(N_VAD):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 300))
    e = rng.uniform(0, 3e6, n).astype(np.float32)
    z = rng.uniform(0, 0.7, n).astype(np.float32)
    h = rng.uniform(0, 1, n).astype(np.float32)
    e_th = float(rng.uniform(1, 1e6)); z_th = float(rng.uniform(0.01, 0.6))
    h_th = float(rng.uniform(0.1, 1.0))
    on = int(rng.integers(0, 8)); off = int(rng.integers(0, 8))
    alpha = float(rng.uniform(0, 5)); use_ad = bool(rng.integers(0, 2))
    ref = oracle.EngineVadOracle(e_th, z_th, h_th, use_ad, alpha, on, off)
    wv, wa = ref.run_all(e, z, h)
    st = vad_ops.initial_vad_state(hangover_on=on)
    gv, ga, _ = vad_ops.streaming_vad(
        jnp.asarray(e), jnp.asarray(z), jnp.asarray(h), st,
        energy_threshold=e_th, zcr_threshold=z_th, entropy_voice_max=h_th,
        use_adaptive=use_ad, adaptive_alpha=alpha, hangover_on=on, release_off=off)
    if not (np.array_equal(np.asarray(gv), wv) and np.array_equal(np.asarray(ga), wa)):
        print("VAD MISMATCH seed", seed, dict(on=on, off=off, alpha=alpha, use_ad=use_ad))
        fails += 1
print(f"vad fuzz: {N_VAD-fails}/{N_VAD} exact", flush=True)

# geometry sweep on features
from sspv_tpu import ops
from sspv_tpu.ops.windows import get_window
g_fails = 0
for seed in range(N_GEOM):
    rng = np.random.default_rng(1000+seed)
    frame = int(rng.integers(64, 600)); hop = int(rng.integers(16, frame))
    n_fft = int(2 ** rng.integers(7, 11)); mels = int(rng.integers(10, 48))
    sr = int(rng.choice([8000, 16000, 22050, 44100]))
    wt = str(rng.choice(["hamming", "hanning", "rectangular"]))
    sig = rng.normal(0, 3000, sr // 2).astype(np.float32)
    w = get_window(wt, frame)
    want = oracle.framing(sig, frame, hop, w)
    got = np.asarray(ops.framing(sig, frame, hop, wt))
    if got.shape != want.shape or (want.size and
        np.mean((got - want) ** 2) / max(np.mean(want ** 2), 1e-12) > 1e-9):
        print("FRAMING MISMATCH", seed, frame, hop, wt); g_fails += 1; continue
    frames = want[:40]
    if frames.size == 0: continue
    gm = np.asarray(ops.compute_mfcc(frames, sr, n_fft=n_fft, num_filters=mels, num_ceps=13))
    wm = oracle.mfcc(frames, sr, n_fft=n_fft, num_filters=mels, num_ceps=13)
    if np.mean((gm - wm) ** 2) / max(np.mean(wm ** 2), 1e-12) > 1e-5:
        print("MFCC MISMATCH", seed, frame, hop, n_fft, mels, sr); g_fails += 1
print(f"geometry fuzz: {N_GEOM-g_fails}/{N_GEOM} within gates", flush=True)
sys.exit(1 if (fails or g_fails) else 0)
