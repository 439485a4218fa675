"""Measure the PyTorch reference's recurrent models (RecursiveUnet / RDCNet,
10 timesteps — ``hcat/r_unet.py:139,221``) on CPU, for the BASELINE.md
recurrent-path ratio.  The reference hardcodes ``.cuda()`` in both forwards
(``r_unet.py:141,152``); we shim Tensor.cuda to identity for CPU.

Usage:  python scripts/measure_recurrent_baseline.py [X Y Z] [iters]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import torch

from tests.reference_loader import reference_runet_module


def bench(net, x, iters):
    with torch.no_grad():
        net(x)  # warm up
        t0 = time.perf_counter()
        for _ in range(iters):
            net(x)
        return (time.perf_counter() - t0) / iters


def main():
    args = [int(a) for a in sys.argv[1:]]
    X, Y, Z = (args[0], args[1], args[2]) if len(args) >= 3 else (256, 256, 10)
    iters = args[3] if len(args) > 3 else 3

    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU shim
    R = reference_runet_module()
    torch.manual_seed(0)
    x = torch.rand(1, 4, X, Y, Z)
    mvx = X * Y * Z / 1e6

    for name, ctor in (
        ("RecursiveUnet", lambda: R.RecursiveUnet()),
        ("RDCNet", lambda: R.RDCNet(in_channels=4, out_channels=5)),
    ):
        net = ctor().eval()
        dt = bench(net, x, iters)
        print(
            f"torch-cpu {name:14s} ({X},{Y},{Z}) 10 steps: "
            f"{dt:.2f} s/vol -> {mvx / dt:.4f} MVx/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
