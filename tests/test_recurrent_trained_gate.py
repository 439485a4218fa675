"""Trained end-to-end gate for the recurrent family (VERDICT r4 #2).

Mirrors ``test_pipeline_dice`` for the reference's recurrent recipe
(``tests/r_unet_test.py:19-91``): train RDCNet briefly on a synthetic
RecursiveStack-style sample with the reference's loss composition
(pwl-weighted BCE on the prob channel + MSE on the vector channels,
Adam lr=1e-3 — ``r_unet_test.py:24,51-54``), then run BOTH compositions on
the identical trained weights:

* this framework's production serving path (``compile_rdcnet_apply``)
  → ``pixel_vec_to_cell`` (``hcat/segment.py:563-658`` semantics);
* the torch reference ``RDCNet`` forward (weights via the jax→torch
  reverse porter) → the same clustering;

and gate on INSTANCE-level agreement: 1:1 label matching by IoU, matched
centers within tolerance.  Training is disk-cached (pure function of
scene/init/steps) so warm runs skip the fit; the gate's assertions are
unchanged by the cache.
"""

import hashlib
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from hcunet_tpu.config import RDCNetConfig
from hcunet_tpu.infer.vector_cluster import pixel_vec_to_cell
from hcunet_tpu.models.rdcnet import RDCNet
from hcunet_tpu.utils.port_torch import rdcnet_state_dict_from_variables

from tests.reference_loader import reference_runet_module

X, Y, Z = 64, 64, 8
TRAIN_STEPS = 150


def _scene(rng):
    """Instance scene + training targets, all in this framework's [X, Y, Z]
    layout: image [1,X,Y,Z,4] normalized, mask/pwl [1,X,Y,Z,1],
    vector [1,X,Y,Z,3] ordered (z,y,x) shape-normalized offsets — the
    RecursiveStack sample contract (``hcat/dataloader.py:230-278``)."""
    centers = [(14, 14, 4), (14, 46, 4), (44, 22, 4), (46, 48, 4)]
    xx, yy, zz = np.meshgrid(
        np.arange(X), np.arange(Y), np.arange(Z), indexing="ij"
    )
    labels = np.zeros((X, Y, Z), np.int32)
    best = np.full((X, Y, Z), np.inf)
    for i, (cx, cy, cz) in enumerate(centers):
        d2 = (xx - cx) ** 2 + (yy - cy) ** 2 + ((zz - cz) * 2.5) ** 2
        hit = (d2 < 8.5**2) & (d2 < best)
        labels[hit] = i + 1
        best = np.where(hit, d2, best)
    mask = (labels > 0).astype(np.float32)

    vector = np.zeros((X, Y, Z, 3), np.float32)
    for i, (cx, cy, cz) in enumerate(centers):
        m = labels == i + 1
        vector[m, 0] = (zz[m] - cz) / Z
        vector[m, 1] = (yy[m] - cy) / Y
        vector[m, 2] = (xx[m] - cx) / X

    intensity = np.exp(-best / (2 * 6.0**2)).astype(np.float32)
    img = np.stack(
        [np.clip(intensity * s + rng.normal(0, 0.02, (X, Y, Z)), 0, 1)
         for s in (0.9, 1.0, 0.95, 0.9)],
        axis=-1,
    ).astype(np.float32)
    img = (img - 0.5) / 0.5  # t.normalize(0.5, 0.5)
    return (
        img[None], mask[None, ..., None],
        np.ones((1, X, Y, Z, 1), np.float32), vector[None], labels,
    )


def _train_rdcnet_cached(model, variables, batch):
    """Reference recipe: Adam lr=1e-3, loss = pixel-BCE(prob) + MSE(vec)
    (``r_unet_test.py:24,51-54``).  Disk-cached on (scene, init, steps)."""
    import optax
    from flax import serialization

    from hcunet_tpu.train.losses import cross_entropy, mse_loss
    from hcunet_tpu.utils.cache import enable_compilation_cache

    img, mask, pwl, vector = batch
    h = hashlib.sha1(str(TRAIN_STEPS).encode())
    for a in (img, mask, vector):
        h.update(np.ascontiguousarray(a).tobytes())
    for leaf in jax.tree_util.tree_leaves(variables):
        h.update(np.asarray(leaf, np.float32).ravel()[::19].tobytes())
    cache_root = enable_compilation_cache()
    path = None
    if cache_root is not None:
        path = os.path.join(
            os.path.dirname(cache_root),
            f"rdc_gate_{h.hexdigest()[:16]}.msgpack",
        )
        if os.path.exists(path):
            with open(path, "rb") as f:
                return serialization.from_bytes(
                    jax.tree.map(np.asarray, variables), f.read()
                )

    tx = optax.adam(1e-3)
    params = variables["params"]
    opt_state = tx.init(params)
    xj, mj, pj, vj = (jnp.asarray(a) for a in (img, mask, pwl, vector))

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply({"params": p}, xj, train=True)
            loss_prob = cross_entropy(out[..., :1], mj, pj, method="pixel")
            loss_vec = mse_loss(out[..., 2:], vj)
            return loss_prob + loss_vec

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    first = last = None
    for i in range(TRAIN_STEPS):
        params, opt_state, loss = step(params, opt_state)
        if i == 0:
            first = float(loss)
        last = float(loss)
    assert last < first * 0.5, (first, last)  # the fit actually converges
    trained = {"params": params}
    if path is not None:
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(jax.tree.map(np.asarray, trained)))
    return trained


def _match_instances(a: np.ndarray, b: np.ndarray):
    """Greedy 1:1 IoU matching of instance labels; returns
    [(id_a, id_b, iou, center_dist)]."""
    from scipy import ndimage as ndi

    ids_a = [i for i in np.unique(a) if i > 0]
    ids_b = [i for i in np.unique(b) if i > 0]
    pairs = []
    used_b = set()
    for ia in ids_a:
        ma = a == ia
        best = (None, 0.0)
        for ib in ids_b:
            if ib in used_b:
                continue
            mb = b == ib
            iou = (ma & mb).sum() / max((ma | mb).sum(), 1)
            if iou > best[1]:
                best = (ib, iou)
        if best[0] is not None:
            used_b.add(best[0])
            ca = np.asarray(ndi.center_of_mass(ma))
            cb = np.asarray(ndi.center_of_mass(b == best[0]))
            pairs.append((ia, best[0], best[1], float(np.linalg.norm(ca - cb))))
    return pairs


@pytest.fixture(autouse=True)
def cpu_cuda_shim(monkeypatch):
    # the reference hardcodes .cuda() in its recurrent forwards
    # (r_unet.py:141,152,223); identity-shim it for cpu torch
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)


@pytest.mark.slow
def test_rdcnet_trained_instance_gate():
    rng = np.random.default_rng(0)
    img, mask, pwl, vector, true_labels = _scene(rng)

    # matched init: torch reference weights ported to jax (the forward
    # parity of this port is pinned by test_recurrent_models.py)
    from hcunet_tpu.utils.port_torch import rdcnet_variables_from_torch_state_dict

    R = reference_runet_module()
    torch.manual_seed(0)
    net = R.RDCNet(in_channels=4, out_channels=5)
    variables = rdcnet_variables_from_torch_state_dict(net.state_dict())

    model = RDCNet(RDCNetConfig())
    trained = _train_rdcnet_cached(model, variables, (img, mask, pwl, vector))

    # --- this framework's serving composition ---
    from hcunet_tpu.infer.compile_recurrent import compile_rdcnet_apply

    # Two reference-internal inconsistencies must be bridged for the
    # composition to function, identically on both sides:
    # (a) the training target is SHAPE-NORMALIZED (VectorToCenter divides
    #     by the volume shape, train_utils.py:270-272) while
    #     pixel_vec_to_cell votes in PIXEL coordinates (segment.py:590-592
    #     adds raw channels to integer indices) → de-normalize;
    # (b) the target's sign is pixel−center (train_utils.py:265-268:
    #     ``z_vec = -com[0] + z``) while the clustering ADDS the prediction
    #     to the pixel index — voting at 2p−c, away from the center →
    #     negate, so votes land ON the centers.
    # The reference never runs this composition end-to-end (r_unet_test.py
    # reviews channel images by eye); the gate needs it functional.
    denorm = np.asarray([-Z, -Y, -X], np.float32)

    apply_fn = compile_rdcnet_apply(model, trained, dtype=jnp.float32)
    out_jax = np.asarray(apply_fn(jnp.asarray(img)))[0]  # [X, Y, Z, 5]
    prob_jax = 1.0 / (1.0 + np.exp(-out_jax[..., 0]))
    labels_jax = pixel_vec_to_cell(out_jax[..., 2:] * denorm, prob_jax)

    # --- the torch reference composition on the SAME trained weights ---
    net.load_state_dict(rdcnet_state_dict_from_variables(trained))
    net = net.eval()
    with torch.no_grad(), torch.inference_mode():
        xt = torch.as_tensor(np.moveaxis(img, -1, 1))
        out_t = net(xt.float())
    out_torch = np.moveaxis(out_t.numpy(), 1, -1)[0]
    prob_torch = 1.0 / (1.0 + np.exp(-out_torch[..., 0]))
    labels_torch = pixel_vec_to_cell(out_torch[..., 2:] * denorm, prob_torch)

    # forward parity on the trained weights (packed serving vs torch)
    np.testing.assert_allclose(out_jax, out_torch, atol=2e-3, rtol=2e-3)

    # the model actually learned the scene: semantic dice vs truth
    sem = prob_jax > 0.5
    truth = true_labels > 0
    dice = 2 * (sem & truth).sum() / max(sem.sum() + truth.sum(), 1)
    assert dice > 0.8, dice

    # instance-level agreement between the two compositions (the gate):
    # 1:1 matching, every instance pair IoU >= 0.6, centers within 3 px
    ids_j = [i for i in np.unique(labels_jax) if i > 0]
    ids_t = [i for i in np.unique(labels_torch) if i > 0]
    assert len(ids_j) == len(ids_t) and len(ids_j) >= 3
    pairs = _match_instances(labels_torch, labels_jax)
    assert len(pairs) == len(ids_t)
    for ia, ib, iou, dist in pairs:
        assert iou >= 0.6, (ia, ib, iou)
        assert dist <= 3.0, (ia, ib, dist)

    # and against the TRUE instances: the composition recovers the scene
    truth_pairs = _match_instances(true_labels, labels_jax)
    assert len(truth_pairs) >= 3
    agree = np.mean([p[2] for p in truth_pairs])
    # recorded in BASELINE.md (trained recurrent gate row)
    print(f"\n[recurrent gate] composition IoU pairs={len(pairs)} "
          f"min={min(p[2] for p in pairs):.3f}; "
          f"truth mean IoU={agree:.3f}; dice={dice:.3f}")
