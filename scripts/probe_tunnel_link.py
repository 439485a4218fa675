"""Characterize the host<->device transfer link (the remote axon tunnel).

The end-to-end ``analyze()`` pipeline is transfer-bound on a remote-tunnel
TPU (BASELINE.md): every chunk uploads its raw voxels (h2d) and fetches its
probability map (d2h), and the reference's own production driver
(``/root/reference/loop_main.py``) moves the same bytes through CUDA's PCIe
link.  This probe measures what the link actually provides, answering:

1. bandwidth per direction at several transfer sizes;
2. whether h2d and d2h overlap (full duplex) or serialize — this decides
   if the pipeline's transfer floor is max(h2d, d2h) or their SUM;
3. whether an h2d overlaps device compute (a dependency-chained scan, so
   the axon client cannot elide the execution).

Output: one human-readable line per measurement + a final JSON summary.

Usage:  python scripts/probe_tunnel_link.py  [--mb 128]
"""

import argparse
import json
import threading
import time

import numpy as np


def timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=128,
                    help="payload size for the duplex/overlap tests")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("device:", dev)
    summary = {"device": str(dev)}

    # fresh device arrays per fetch — jax caches host copies, so fetching
    # the same array twice measures a memcpy, not the link
    mk = jax.jit(lambda s, n: jnp.full((n,), s, jnp.float32), static_argnums=1)

    # 1. bandwidth vs size (h2d in uint16, the production upload dtype)
    print("-- bandwidth vs transfer size --")
    bw = {}
    for mb in (16, 64, args.mb):
        n = mb * 1024 * 1024
        h = np.random.randint(0, 65535, size=n // 2, dtype=np.uint16)
        jax.device_put(h[:1024], dev).block_until_ready()  # warm path
        t_up = timed(lambda: jax.device_put(h, dev).block_until_ready())
        y = mk(float(mb), n // 4)
        y.block_until_ready()
        t_down = timed(lambda: np.asarray(y))
        bw[mb] = {"h2d_mb_s": round(mb / t_up, 1),
                  "d2h_mb_s": round(mb / t_down, 1)}
        print(f"  {mb:4d} MB   h2d {mb / t_up:7.1f} MB/s   "
              f"d2h {mb / t_down:7.1f} MB/s")
    summary["bandwidth"] = bw

    # 2. duplex: concurrent h2d + d2h of --mb each
    mb = args.mb
    n = mb * 1024 * 1024
    h = np.random.randint(0, 65535, size=n // 2, dtype=np.uint16)
    t_h2d = timed(lambda: jax.device_put(h, dev).block_until_ready())
    y = mk(7.0, n // 4)
    y.block_until_ready()
    t_d2h = timed(lambda: np.asarray(y))
    y2 = mk(11.0, n // 4)
    y2.block_until_ready()
    res = {}
    up = threading.Thread(
        target=lambda: res.__setitem__(
            "up", timed(lambda: jax.device_put(h, dev).block_until_ready())))
    down = threading.Thread(
        target=lambda: res.__setitem__("down", timed(lambda: np.asarray(y2))))
    t0 = time.perf_counter()
    up.start(); down.start(); up.join(); down.join()
    wall = time.perf_counter() - t0
    duplex = wall < 0.75 * (t_h2d + t_d2h)
    print(f"-- duplex --\n  serial sum {t_h2d + t_d2h:.2f}s, concurrent "
          f"wall {wall:.2f}s -> {'DUPLEX' if duplex else 'SERIALIZED'}")
    summary["duplex"] = {"serial_sum_s": round(t_h2d + t_d2h, 2),
                         "concurrent_s": round(wall, 2), "duplex": duplex}

    # 3. h2d vs compute overlap: a dependency-chained matmul scan (the
    # axon client elides repeated executions on identical buffers, so a
    # plain loop of f(x) measures nothing — BASELINE.md round-3 note)
    x = jnp.ones((2048, 2048), jnp.bfloat16)

    @jax.jit
    def chain(x):
        import jax.lax as lax

        def body(c, _):
            c = jnp.tanh(c @ c) * 1e-3
            return c, ()

        c, _ = lax.scan(body, x, None, length=400)
        return c

    chain(x).block_until_ready()
    t_c = timed(lambda: chain(x).block_until_ready())
    fut = chain(x)
    t_u = timed(lambda: jax.device_put(h, dev).block_until_ready())
    timed(lambda: fut.block_until_ready())
    # if the upload took ~t_h2d while the chain was in flight, they overlap
    overlap = t_u < 1.25 * t_h2d and t_c > 0.5 * t_h2d
    print(f"-- compute overlap --\n  chain {t_c:.2f}s, h2d-during-chain "
          f"{t_u:.2f}s (alone {t_h2d:.2f}s) -> "
          f"{'OVERLAPS' if overlap else 'inconclusive'}")
    summary["h2d_during_compute_s"] = round(t_u, 2)
    summary["h2d_alone_s"] = round(t_h2d, 2)
    summary["compute_chain_s"] = round(t_c, 2)

    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
