"""Measure U-Net training throughput (BASELINE.md config #3).

Reference side: the torch production 3D U-Net, one (128,128,24) crop per
step (the canonical recipe's crop — ``tests/transforms_test.py:26``),
pwl-BCE loss, Adam, CPU.  Ours: same shapes on the TPU via UNetTrainer.

Usage: python scripts/measure_train_throughput.py [torch|jax]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

CROP = (128, 128, 24)
STEPS = 10


def measure_torch():
    import torch

    from tests.reference_loader import reference_loss_module, reference_unet_module

    U = reference_unet_module()
    L = reference_loss_module()
    torch.manual_seed(0)
    net = U.Unet_Constructor(
        image_dimensions=3, in_channels=4, out_channels=1,
        feature_sizes=[16, 32, 64, 128],
        kernel={"conv1": (3, 3, 2), "conv2": (3, 3, 1)},
        upsample_kernel=(8, 8, 2), max_pool_kernel=(2, 2, 1),
        upsample_stride=(2, 2, 1), dilation=1, groups=2,
    ).train()
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)
    x = torch.rand(1, 4, *CROP)
    mask = (torch.rand(1, 1, *CROP) > 0.7).float()
    pwl = torch.rand(1, 1, *CROP)

    def step():
        opt.zero_grad()
        out = net(x)
        loss = L.cross_entropy(out, mask, pwl, method="pixel")
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warm
    t0 = time.perf_counter()
    for _ in range(STEPS):
        step()
    dt = (time.perf_counter() - t0) / STEPS
    print(f"torch-cpu train: {dt:.3f}s/step -> {1 / dt:.3f} samples/s")


def measure_jax():
    import jax
    import jax.numpy as jnp

    from hcunet_tpu.config import UNetConfig
    from hcunet_tpu.models.unet import init_unet
    from hcunet_tpu.train.trainer import TrainConfig, UNetTrainer

    cfg = UNetConfig.production_3d()
    model, variables = init_unet(cfg, jax.random.PRNGKey(0), CROP)
    trainer = UNetTrainer(model, variables, TrainConfig(log_every=0))
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (1, *CROP, 4))
    mask = (jax.random.uniform(jax.random.PRNGKey(2), (1, *CROP, 1)) > 0.7).astype(
        jnp.float32
    )
    pwl = jax.random.uniform(jax.random.PRNGKey(3), (1, *CROP, 1))
    trainer.train_step(x, mask, pwl)  # warm/compile
    t0 = time.perf_counter()
    for _ in range(STEPS):
        loss = trainer.train_step(x, mask, pwl)
    dt = (time.perf_counter() - t0) / STEPS
    print(f"jax-tpu train: {dt:.3f}s/step -> {1 / dt:.3f} samples/s (loss {loss:.4f})")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("torch", "both"):
        measure_torch()
    if which in ("jax", "both"):
        measure_jax()
