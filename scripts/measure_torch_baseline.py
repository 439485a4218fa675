"""Measure the PyTorch reference's tiled-inference throughput on CPU.

The reference publishes no benchmark numbers (BASELINE.md), so the baseline
is measured: build the production 3D U-Net (``hcat/main.py:46-55``), run the
reference's tiled predict loop (CPU tile table: EVAL [300,300,15],
PAD (128,128,10) — ``hcat/segment.py:55-57``) over a synthetic volume, and
report megavoxels/second.  The resulting number is recorded in BASELINE.md
and used as ``vs_baseline`` denominator by bench.py.

Usage:  python scripts/measure_torch_baseline.py [X Y Z]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import torch

from tests.reference_loader import reference_unet_module
from hcunet_tpu.core.shapes import calculate_indexes


def main():
    shape = tuple(int(a) for a in sys.argv[1:4]) or (600, 600, 15)
    U = reference_unet_module()
    torch.manual_seed(0)
    net = U.Unet_Constructor(
        image_dimensions=3,
        in_channels=4,
        out_channels=1,
        feature_sizes=[16, 32, 64, 128],
        kernel={"conv1": (3, 3, 2), "conv2": (3, 3, 1)},
        upsample_kernel=(8, 8, 2),
        max_pool_kernel=(2, 2, 1),
        upsample_stride=(2, 2, 1),
        dilation=1,
        groups=2,
    ).eval()

    E = [300, 300, 15]
    P = (128, 128, 10)
    X, Y, Z = shape
    if Z < E[2]:
        E[2] = Z
    img = torch.rand(1, 4, X, Y, Z)

    # reference-style reflection pad
    padded = img.numpy()
    for axis, p in zip((2, 3, 4), P):
        left = np.flip(np.take(padded, range(0, p), axis=axis), axis=axis)
        right = np.flip(
            np.take(padded, range(padded.shape[axis] - p, padded.shape[axis]), axis=axis),
            axis=axis,
        )
        padded = np.concatenate([left, padded, right], axis=axis)
    padded = torch.as_tensor(padded).float()

    x_ind = calculate_indexes(P[0], E[0], X, padded.shape[2])
    y_ind = calculate_indexes(P[1], E[1], Y, padded.shape[3])
    z_ind = calculate_indexes(P[2], E[2], Z, padded.shape[4])
    n_tiles = len(x_ind) * len(y_ind) * len(z_ind)
    print(f"volume {shape}, {n_tiles} tiles", flush=True)

    mask = torch.zeros(1, 1, X, Y, Z)
    t0 = time.perf_counter()
    with torch.no_grad():
        done = 0
        for z0, z1 in z_ind:
            for x0, x1 in x_ind:
                for y0, y1 in y_ind:
                    sl = padded[:, :, x0:x1, y0:y1, z0:z1]
                    out = net(sl)
                    out = out[
                        :, :, P[0] : E[0] + P[0], P[1] : E[1] + P[1], P[2] : E[2] + P[2]
                    ]
                    out.mul_(-1).exp_().add_(1).pow_(-1)
                    xe, ye, ze = min(x0 + E[0], X), min(y0 + E[1], Y), min(z0 + E[2], Z)
                    mask[:, :, x0:xe, y0:ye, z0:ze] = out[
                        :, :, : xe - x0, : ye - y0, : ze - z0
                    ]
                    done += 1
                    print(
                        f"  tile {done}/{n_tiles} "
                        f"({time.perf_counter() - t0:.1f}s elapsed)",
                        flush=True,
                    )
    dt = time.perf_counter() - t0
    mvx = X * Y * Z / 1e6
    print(f"torch-cpu reference: {dt:.2f}s for {mvx:.1f} MVx "
          f"-> {mvx / dt:.3f} MVx/s")


if __name__ == "__main__":
    main()
