"""Generate deterministic synthetic YUV test clips (no external content needed).

Produces 8-bit 4:2:0 planar YUV with a mix of gradients, texture, edges and
motion so that intra/inter/RD paths all get exercised.
"""
import numpy as np
import sys


def gen_frame(w, h, t, seed=1234):
    rng = np.random.RandomState(seed + 7 * t)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # moving diagonal gradient + plasma + noise + a moving box edge
    y = (
        96
        + 60 * np.sin(2 * np.pi * (xx + 3.0 * t) / 64.0)
        + 40 * np.cos(2 * np.pi * (yy + 2.0 * t) / 48.0)
        + 20 * np.sin(2 * np.pi * (xx + yy + 5.0 * t) / 96.0)
    )
    bx = int((w // 4 + 4 * t) % (w - 32))
    by = int((h // 3 + 2 * t) % (h - 32))
    y[by:by + 32, bx:bx + 32] = 210
    y += rng.randn(h, w) * 3.0
    y = np.clip(y, 0, 255)
    u = 128 + 30 * np.sin(2 * np.pi * (xx[::2, ::2] + 2 * t) / 80.0)
    v = 128 + 30 * np.cos(2 * np.pi * (yy[::2, ::2] + 2 * t) / 70.0)
    u = np.clip(u + rng.randn(h // 2, w // 2) * 2.0, 0, 255)
    v = np.clip(v + rng.randn(h // 2, w // 2) * 2.0, 0, 255)
    return y.astype(np.uint8), u.astype(np.uint8), v.astype(np.uint8)


def write_clip(path, w, h, n_frames, seed=1234):
    with open(path, "wb") as f:
        for t in range(n_frames):
            y, u, v = gen_frame(w, h, t, seed)
            f.write(y.tobytes())
            f.write(u.tobytes())
            f.write(v.tobytes())


if __name__ == "__main__":
    path, w, h, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
    write_clip(path, w, h, n)
    print(f"wrote {path}: {w}x{h} x{n} frames")
