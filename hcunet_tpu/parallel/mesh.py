"""Device mesh construction and axis conventions.

The reference has no distributed machinery beyond Ray task fan-out
(SURVEY.md §2.7); here the communication layer is JAX's: a ``Mesh`` over
ICI/DCN with named axes, sharding annotations, and XLA collectives.

Axis conventions used across the framework:

* ``data``    — batch / independent-sample parallelism (the moral successor
  of ``loop_main.py``'s image loop and Ray preprocessing fan-out);
* ``model``   — channel (tensor) parallelism over conv feature dimensions;
* ``spatial`` — sharding of a volume's X axis with halo exchange (this
  workload's counterpart of context/sequence parallelism — SURVEY.md §5.7).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SPATIAL_AXIS = "spatial"


def make_mesh(
    axis_sizes: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh; by default all devices on one ``data`` axis.

    ``axis_sizes`` maps axis name -> size; sizes must multiply to the device
    count (a trailing axis may be -1 to absorb the remainder).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if not axis_sizes:
        axis_sizes = {DATA_AXIS: n}
    names = list(axis_sizes.keys())
    sizes = list(axis_sizes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh {dict(zip(names, sizes))} != {n} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)


def default_multichip_mesh(n_devices: int, devices=None) -> Mesh:
    """The standard mesh for this framework: data × model × spatial.

    Falls back by axis (spatial, then model) for counts that don't factor."""
    if devices is None:
        devices = jax.devices()[:n_devices]
    if n_devices >= 8 and n_devices % 4 == 0:
        return make_mesh(
            {DATA_AXIS: n_devices // 4, MODEL_AXIS: 2, SPATIAL_AXIS: 2}, devices
        )
    if n_devices >= 4 and n_devices % 2 == 0:
        return make_mesh({DATA_AXIS: n_devices // 2, MODEL_AXIS: 2}, devices)
    return make_mesh({DATA_AXIS: n_devices}, devices)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over ``data`` (and leave the rest
    replicated)."""
    axes = [a for a in (DATA_AXIS,) if a in mesh.axis_names]
    return NamedSharding(mesh, P(tuple(axes) if axes else None))


def tiles_sharding(mesh: Mesh, n: Optional[int] = None) -> NamedSharding:
    """Shard a leading tile/slab dim over EVERY mesh axis, flattened.

    The recipe behind all multi-chip slab splitting (recurrent split-X
    serving, detection z-plane batches): ``PartitionSpec((axis0, axis1,
    ...))`` puts the leading dim's tiles one-per-device regardless of the
    mesh's logical factorization.  ``n`` (when known statically) validates
    the tile count divides the device count — XLA would otherwise reject
    the constraint with an opaque shape error at trace time."""
    if n is not None and int(n) % mesh.size != 0:
        raise ValueError(
            f"{n} tiles cannot shard evenly over the {mesh.size}-device "
            f"mesh {dict(mesh.shape)}; pick split/batch a multiple of "
            f"{mesh.size}"
        )
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def param_sharding_spec(path_leaf_shape, mesh: Mesh, min_size: int = 32):
    """PartitionSpec for one parameter: shard the trailing (out-feature)
    axis over ``model`` when it divides evenly and is large enough.

    Conv kernels here are ``[*k, Cin, Cout]`` — sharding Cout means each
    model-shard computes a slice of output channels; XLA inserts the
    all-gather where the next layer needs full inputs.
    """
    shape = path_leaf_shape
    if MODEL_AXIS not in mesh.axis_names:
        return P()
    m = mesh.shape[MODEL_AXIS]
    if len(shape) >= 1 and shape[-1] % m == 0 and shape[-1] >= min_size:
        return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))
    return P()


def shard_params(params, mesh: Mesh, min_size: int = 32):
    """Apply :func:`param_sharding_spec` across a parameter pytree, returning
    a matching tree of NamedShardings."""
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(
            mesh, param_sharding_spec(np.shape(leaf), mesh, min_size)
        ),
        params,
    )
