"""Benchmark: end-to-end all-intra 1080p encode, frames/s per chip.

Pipeline measured: batched TPU analysis (JAX, per-level executables) +
native C closed-loop coding pass + bitstream assembly.  Baseline:
xeve --profile baseline --preset medium --keyint 1 -m 1 at 1080p on CPU
measured at 0.326 fps (see BASELINE.md; re-measure with
tools/measure_baseline.sh).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

XEVE_1080P_AI_FPS = 0.326  # measured: xeve_app 1920x1088 AI QP32 medium, 1 thread

W, H = 1920, 1088
QP = 32
BATCH = 4
N_FRAMES = 16
N_BATCHES = 2


def gen_frames(n):
    from tools.gen_test_content import gen_frame
    frames = []
    for t in range(n):
        y, u, v = gen_frame(W, H, t)
        frames.append((y.astype(np.int16) << 2, u.astype(np.int16) << 2,
                       v.astype(np.int16) << 2))
    return frames


def main():
    from xeve_tpu.api import Encoder
    from xeve_tpu.params import EncoderParams

    frames = gen_frames(N_FRAMES)
    analysis = "jax"
    try:
        import jax
        jax.devices()
    except Exception:
        analysis = "numpy"

    enc = Encoder(EncoderParams(w=W, h=H, qp=QP, keyint=1), analysis=analysis)
    # warmup (compile / persistent-cache load)
    t_warm = time.time()
    enc.encode_frames(frames[:BATCH], batch=BATCH)
    warm_s = time.time() - t_warm

    t0 = time.time()
    total_frames = 0
    total_bytes = 0
    for _ in range(N_BATCHES):
        out = enc.encode_frames(frames, batch=BATCH)
        total_frames += len(out)
        total_bytes += sum(len(b) for b, _ in out)
    dt = time.time() - t0
    fps = total_frames / dt

    print(json.dumps({
        "metric": "1080p_allintra_encode_fps_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / XEVE_1080P_AI_FPS, 2),
        "detail": {
            "analysis_engine": analysis,
            "warmup_s": round(warm_s, 1),
            "kbps_at_30fps": round(total_bytes * 8 * 30 / total_frames / 1000, 0),
            "baseline_fps": XEVE_1080P_AI_FPS,
        },
    }))


if __name__ == "__main__":
    main()
