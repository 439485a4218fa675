"""Pipeline dice parity vs the torch reference (VERDICT round 1, item 5).

Composes the reference's own stages — its ``Unet_Constructor`` forward on
the reference tile grid (``hcat/segment.py:70-126``), the blur/floor/rescale
postprocess (``hcat/main.py:130-132``), and the detection-seeded instance
watershed (``hcat/segment.py:221-505``, via this repo's parity-tested
implementation) — against the framework's production path (packed serving
forward, batched uniform tile grid, fused postprocess) on identical ported
weights, and asserts dice / per-cell IoU parity of the outputs.

The reference itself cannot run end-to-end here (skimage is absent), so the
watershed stage is shared: it is the parity-proven native implementation
(tests/test_watershed_parity.py pins it to a pure-python skimage-semantics
oracle), fed each side's own probability map.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from hcunet_tpu.config import TileConfig, UNetConfig, WatershedConfig
from hcunet_tpu.core.shapes import calculate_indexes
from hcunet_tpu.infer.compile import compile_serving_apply
from hcunet_tpu.infer.instance import generate_unique_segmentation_mask
from hcunet_tpu.infer.tiling import predict_segmentation_mask
from hcunet_tpu.models.unet import UNet

from reference_loader import reference_unet_module
from scripts.demo_synthetic import build_volume

# reference CPU-fallback tile geometry (hcat/segment.py:55-57)
REF_EVAL = [300, 300, 15]
REF_PAD = (128, 128, 10)


def _torch_reference_prob_cached(net, variables, vol_norm: np.ndarray) -> np.ndarray:
    """Disk-cached wrapper: the torch tile loop costs ~21 min on this 1-cpu
    host and its output is a pure function of (weights, scene, geometry) —
    cache it keyed by exactly those.  Any change to the trained weights or
    the scene invalidates the cache, so the gate's force is unchanged; only
    repeat runs of the identical comparison are fast."""
    import hashlib

    from hcunet_tpu.utils.cache import enable_compilation_cache

    leaves = jax.tree_util.tree_leaves(variables)
    h = hashlib.sha1()
    for leaf in leaves:
        h.update(np.ascontiguousarray(np.asarray(leaf, np.float32)).tobytes())
    h.update(np.ascontiguousarray(vol_norm).tobytes())
    h.update(str((REF_EVAL, REF_PAD)).encode())
    cache_root = enable_compilation_cache()
    path = None
    if cache_root is not None:
        import os

        path = os.path.join(
            os.path.dirname(cache_root), f"dice_gate_{h.hexdigest()[:16]}.npz"
        )
        if os.path.exists(path):
            with np.load(path) as z:
                return z["prob"]
    prob = _torch_reference_prob(net, vol_norm)
    if path is not None:
        np.savez_compressed(path, prob=prob)
    return prob


def _torch_reference_prob(net, vol_norm: np.ndarray) -> np.ndarray:
    """The reference's tiled ``predict_segmentation_mask`` (CPU geometry) —
    reflection pad, ragged grid, per-tile forward, in-place sigmoid."""
    X, Y, Z, C = vol_norm.shape
    img = torch.as_tensor(vol_norm).permute(3, 0, 1, 2)[None].float()
    E = [min(e, s) for e, s in zip(REF_EVAL, (X, Y, Z))]
    P = REF_PAD

    padded = img.numpy()
    for axis, p in zip((2, 3, 4), P):
        left = np.flip(np.take(padded, range(0, p), axis=axis), axis=axis)
        right = np.flip(
            np.take(
                padded, range(padded.shape[axis] - p, padded.shape[axis]),
                axis=axis,
            ),
            axis=axis,
        )
        padded = np.concatenate([left, padded, right], axis=axis)
    padded = torch.as_tensor(padded).float()

    x_ind = calculate_indexes(P[0], E[0], X, padded.shape[2])
    y_ind = calculate_indexes(P[1], E[1], Y, padded.shape[3])
    z_ind = calculate_indexes(P[2], E[2], Z, padded.shape[4])
    prob = np.zeros((X, Y, Z), np.float32)
    with torch.no_grad():
        for z0, z1 in z_ind:
            for x0, x1 in x_ind:
                for y0, y1 in y_ind:
                    out = net(padded[:, :, x0:x1, y0:y1, z0:z1])
                    out = torch.sigmoid(out)[
                        :, :, P[0]: E[0] + P[0], P[1]: E[1] + P[1],
                        P[2]: E[2] + P[2],
                    ]
                    xe = min(x0 + E[0], X)
                    ye = min(y0 + E[1], Y)
                    ze = min(z0 + E[2], Z)
                    prob[x0:xe, y0:ye, z0:ze] = out[
                        0, 0, : xe - x0, : ye - y0, : ze - z0
                    ].numpy()
    return prob


def _postprocess_host(prob: np.ndarray, sigma=3.0, floor=0.25, scale=10.0):
    """hcat/main.py:130-132 on the host (skimage gaussian ≙ scipy nearest)."""
    from scipy.ndimage import gaussian_filter

    out = gaussian_filter(prob, sigma, mode="nearest", truncate=4.0)
    out[out < floor] = 0.0
    return (out * scale).astype(np.float32)


def _label_ious(a: np.ndarray, b: np.ndarray):
    """Per-label IoU between two instance masks with shared label ids."""
    ious = []
    for lbl in np.unique(a):
        if lbl == 0:
            continue
        ma, mb = a == lbl, b == lbl
        union = (ma | mb).sum()
        ious.append((ma & mb).sum() / union if union else 0.0)
    return np.asarray(ious)


def _train_briefly(model, variables, vol_norm, target, steps=50):
    """A few Adam steps of pwl-BCE on the scene so the probability map has
    real peaks/basins (random weights give plateau noise whose watershed
    lines are numerically unstable — meaningless for a parity gate).

    Disk-cached like the torch prob map: the result is a pure function of
    (init variables, scene, steps) — on this 1-cpu host the 50 steps cost
    ~8 min, the dominant share of the gate after the torch cache landed.
    Any change to the init, scene or budget invalidates the key."""
    import hashlib
    import os

    import optax

    from hcunet_tpu.train.losses import cross_entropy
    from hcunet_tpu.utils.cache import enable_compilation_cache

    h = hashlib.sha1()
    for leaf in jax.tree_util.tree_leaves(variables):
        h.update(np.ascontiguousarray(np.asarray(leaf, np.float32)).tobytes())
    h.update(np.ascontiguousarray(vol_norm).tobytes())
    h.update(str(steps).encode())
    cache_root = enable_compilation_cache()
    path = None
    if cache_root is not None:
        path = os.path.join(
            os.path.dirname(cache_root),
            f"dice_fit_{h.hexdigest()[:16]}.msgpack",
        )
        if os.path.exists(path):
            from flax import serialization

            with open(path, "rb") as f:
                return serialization.from_bytes(
                    jax.tree.map(np.asarray, variables), f.read()
                )

    x = jnp.asarray(vol_norm[None, 16:144, 16:144, :, :])
    y = jnp.asarray(target[None, 16:144, 16:144, :, None].astype(np.float32))
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"],
            )
            return cross_entropy(out, y, method="pixel"), upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    for _ in range(steps):
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state)
    fitted = {"params": params, "batch_stats": batch_stats}
    if path is not None:
        from flax import serialization

        with open(path, "wb") as f:
            f.write(serialization.to_bytes(jax.tree.map(np.asarray, fitted)))
    return fitted


def test_pipeline_dice_vs_torch_reference_composition():
    from hcunet_tpu.utils.port_torch import unet_state_dict_from_variables

    volume, centers, _ = build_volume(X=192, Y=192, Z=10, n_cells=10, seed=3)
    vol_norm = ((volume - 0.5) / 0.5).astype(np.float32)

    cfg = UNetConfig(reference_skip_bug=True)
    model = UNet(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 140, 140, 10, 4), jnp.float32)
    )
    variables = _train_briefly(
        model, variables, vol_norm, volume[..., 1] > 0.3
    )

    # trained weights ported INTO the torch reference (reverse port)
    U = reference_unet_module()
    net = U.Unet_Constructor(
        image_dimensions=3, in_channels=4, out_channels=1,
        feature_sizes=[16, 32, 64, 128],
        kernel={"conv1": (3, 3, 2), "conv2": (3, 3, 1)},
        upsample_kernel=(8, 8, 2), max_pool_kernel=(2, 2, 1),
        upsample_stride=(2, 2, 1), dilation=1, groups=2,
    )
    net.load_state_dict(
        unet_state_dict_from_variables(variables, cfg), strict=True
    )
    net.eval()

    # reverse-port sanity: same logits both frameworks on one crop
    crop = vol_norm[None, :96, :96, :]
    with torch.no_grad():
        want = net(torch.as_tensor(crop).permute(0, 4, 1, 2, 3))
    got = model.apply(variables, jnp.asarray(crop), train=False)
    np.testing.assert_allclose(
        np.asarray(got)[0, ..., 0], want[0, 0].numpy(), atol=5e-4, rtol=1e-3
    )

    # --- reference composition (torch forward, ragged grid, host blur) ---
    prob_ref = _torch_reference_prob_cached(net, variables, vol_norm)
    post_ref = _postprocess_host(prob_ref)

    # --- framework production path (packed forward, uniform grid, fused
    # postprocess on device) ---
    model = UNet(cfg)
    apply_fn = jax.tree_util.Partial(
        compile_serving_apply(model, variables, dtype=jnp.float32)
    )
    post_jax = predict_segmentation_mask(
        apply_fn,
        jnp.asarray(vol_norm[None]),
        cfg,
        TileConfig(eval_size=(96, 96, 15), pad=(56, 56, 4), batch=2),
        use_probability_map=True,
        postprocess=(3.0, 0.25, 10.0),
    )
    post_jax = np.asarray(post_jax)[0, ..., 0]

    # semantic dice on the thresholded postprocessed maps.
    # NOTE the two pipelines run DIFFERENT tile geometries (the production
    # fast grid vs the reference's CPU whole-window), and the reference's
    # decoder crops are top-left (not centered), so its voxel alignment
    # shifts with tile size — the reference's own output already differs
    # between its 4 GB / 11 GB / CPU tile classes the same way.  Bit-exact
    # parity on the SAME grid is proven separately
    # (test_tiling.py::test_reference_grid_parity_with_torch_oracle); this
    # end-to-end gate allows the documented tile-alignment wobble.
    a = post_ref > 0.5
    b = post_jax > 0.5
    dice = 2 * (a & b).sum() / max(a.sum() + b.sum(), 1)
    assert a.sum() > 1000  # scene is non-trivial
    assert dice > 0.98, dice

    # --- instance stage, identical GT-derived candidates both sides ---
    # the net is only briefly trained (50 steps — no reference checkpoint
    # exists, SURVEY §0), so its probability map is approximate but
    # IDENTICAL across pipelines — pick
    # each candidate's z at the map's own argmax so the occupancy filter
    # (segment.py:286-305 semantics) keeps a meaningful number of seeds
    zlv = [int(np.argmax(post_ref[x, y, :])) for x, y in centers]
    cand = {
        "boxes": np.asarray(
            [[x - 7, y - 7, x + 7, y + 7] for x, y in centers], np.float32
        ),
        "scores": np.full(len(centers), 0.9, np.float32),
        "labels": np.ones(len(centers), np.int64),
        "z_level": np.asarray(zlv, np.float32),
    }
    wcfg = WatershedConfig(expand_mask=2, z_tolerance=10)
    inst_ref, _ = generate_unique_segmentation_mask(post_ref, dict(cand), wcfg)
    inst_jax, _ = generate_unique_segmentation_mask(post_jax, dict(cand), wcfg)

    n_ref = len(np.unique(inst_ref)) - 1
    n_jax = len(np.unique(inst_jax)) - 1
    assert n_ref >= len(centers) // 2  # watershed actually segmented cells
    assert n_ref == n_jax
    ious = _label_ious(inst_ref, inst_jax)
    # probability deltas (tile-alignment wobble above) move watershed lines
    # on plateaus; basins must still correspond cell-for-cell
    assert np.mean(ious) > 0.85, ious
    assert np.min(ious) > 0.60, ious
