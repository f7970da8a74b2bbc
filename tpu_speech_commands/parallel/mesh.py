"""Device mesh construction — the framework's "distributed backend".

The reference has no parallelism of any kind (SURVEY.md §2.9); on TPU the
communication layer *is* XLA collectives emitted by jit over a
`jax.sharding.Mesh`.  This module owns mesh construction and the sharding
rules; there is no custom transport to write — collectives ride ICI within
a slice (and DCN across slices) automatically once shardings are declared.

Axes:
- 'replica' — slice-parallel axis for multi-slice pods (present only on
  hybrid meshes from `make_hybrid_mesh`): pure data parallelism whose
  gradient all-reduce crosses DCN, so it carries ONLY the once-per-step
  gradient/metric reduction — nothing per-layer ever travels this axis
- 'data'  — batch-parallel axis (gradients all-reduced by XLA psum over ICI)
- 'model' — tensor-parallel axis for the dense layers (demonstrated in the
  dry-run path; the production models are small enough that data parallel
  is the perf-optimal layout, so model=1 is the default)
"""
from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

REPLICA_AXIS = "replica"
DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    Default: all devices on the data axis.  Devices are taken in
    jax.devices() order and reshaped row-major, which keeps the fast
    'model' axis on adjacent (ICI-neighbour) chips for the default
    enumeration order.
    """
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data < 1 or n_model < 1 or n_data * n_model > len(devices):
        # n_data floors to 0 when n_model > device count — a zero-device
        # mesh fails confusingly far downstream, so reject it here
        raise ValueError(
            f"mesh {n_data}x{n_model} does not fit {len(devices)} devices"
        )
    dev_array = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def make_hybrid_mesh(
    n_replica: int,
    n_data: int | None = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """Build a ('replica', 'data', 'model') mesh for a multi-slice pod.

    'replica' is the DCN (cross-slice) axis; 'data'/'model' stay within a
    slice so every per-layer collective (the tensor-parallel psum) rides
    ICI and only the once-per-step gradient all-reduce crosses DCN —
    SURVEY.md §2.9's ICI/DCN mapping.

    On real multi-slice hardware (devices carry a `slice_index`) the
    assignment is delegated to `mesh_utils.create_hybrid_device_mesh`,
    which keeps each mesh row inside one slice.  Single-slice device sets
    (including the virtual CPU mesh used by tests and the driver dryrun)
    fall back to a row-major reshape: the axis SEMANTICS — batch split
    over replica x data, gradient reduce over both — are identical, only
    the physical slice boundary is simulated.
    """
    devices = list(devices) if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // (n_replica * n_model)
    if min(n_replica, n_data, n_model) < 1 or \
            n_replica * n_data * n_model > len(devices):
        raise ValueError(
            f"hybrid mesh {n_replica}x{n_data}x{n_model} does not fit "
            f"{len(devices)} devices"
        )
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    if len(slice_ids) > 1 and None not in slice_ids:
        if n_replica * n_data * n_model != len(devices):
            # create_hybrid_device_mesh requires the shape to cover the
            # device list exactly; a silent prefix would break the
            # slice-boundary assignment. Under-provisioned shapes must
            # pass an explicit device subset instead.
            raise ValueError(
                f"hybrid mesh {n_replica}x{n_data}x{n_model} uses "
                f"{n_replica * n_data * n_model} of {len(devices)} "
                "multi-slice devices; pass devices= with exactly the "
                "devices to use (slice-aware assignment cannot pick a "
                "prefix)"
            )
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, n_data, n_model),
            dcn_mesh_shape=(n_replica, 1, 1),
            devices=devices,
        ).reshape(n_replica, n_data, n_model)
    else:
        dev_array = np.asarray(
            devices[: n_replica * n_data * n_model]
        ).reshape(n_replica, n_data, n_model)
    return Mesh(dev_array, (REPLICA_AXIS, DATA_AXIS, MODEL_AXIS))


def batch_axes(mesh: Mesh) -> tuple[str, ...]:
    """Mesh axes the batch dimension shards over, outermost first."""
    return tuple(
        a for a in (REPLICA_AXIS, DATA_AXIS) if a in mesh.axis_names
    )


def batch_shards(mesh: Mesh | None) -> int:
    """Total way-count of the batch split (replica x data)."""
    if mesh is None:
        return 1
    return math.prod(mesh.shape[a] for a in batch_axes(mesh))


def batch_spec(mesh: Mesh) -> P:
    """PartitionSpec splitting the leading axis over every batch axis."""
    axes = batch_axes(mesh)
    return P(axes if len(axes) > 1 else (axes[0] if axes else None))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'replica' x 'data'."""
    return NamedSharding(mesh, batch_spec(mesh))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_spec(path: tuple[str, ...], leaf) -> P:
    """Tensor-parallel partition rule for model parameters.

    The hidden 'feature_dense' projection is column-sharded and the
    'score_predict' head row-sharded over 'model' (a megatron-style pair:
    the activation stays sharded between them and XLA inserts the psum at
    the head output).  Everything else — convs, BN, RNN cells — is
    replicated: at these layer sizes replication is both the fastest and
    the memory-cheapest layout.
    """
    from ..utils import path_names

    names = path_names(path)
    if "feature_dense" in names and names[-1] == "kernel":
        return P(None, MODEL_AXIS)
    if "feature_dense" in names and names[-1] == "bias":
        return P(MODEL_AXIS)
    if "score_predict" in names and names[-1] == "kernel":
        return P(MODEL_AXIS, None)
    return P()


def shard_map_no_check(fn, mesh: Mesh, in_specs, out_specs):
    """shard_map with replication checking off, on the stable API.

    Pallas custom calls don't participate in shard_map's sharding-rule
    inference, so every wrap in this framework disables the check.  The
    stable `jax.shard_map` entry point calls the knob `check_vma`; older
    releases (and the jax.experimental module the stable one replaced)
    call it `check_rep` — probe the signature rather than the version.
    """
    import inspect

    stable = getattr(jax, "shard_map", None)
    if stable is None:
        from jax.experimental.shard_map import shard_map as sm

        use_vma = False  # the experimental module always used check_rep
    else:
        sm = stable
        try:
            use_vma = "check_vma" in inspect.signature(sm).parameters
        except (TypeError, ValueError):  # unsignaturable wrapper: assume new
            use_vma = True
    kw = {"check_vma": False} if use_vma else {"check_rep": False}
    return sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **kw)


def state_sharding(tree, mesh: Mesh, with_model_parallel: bool = True):
    """NamedSharding pytree for a train state / variables pytree."""

    def to_sharding(path, leaf):
        if with_model_parallel and mesh.shape.get(MODEL_AXIS, 1) > 1:
            spec = param_spec(path, leaf)
            # only shard dims that divide evenly; fall back to replication
            arr_shape = getattr(leaf, "shape", ())
            ok = True
            for dim, axis in zip(arr_shape, spec):
                if axis is not None and dim % mesh.shape[axis] != 0:
                    ok = False
            if ok and len(spec) <= len(arr_shape):
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(to_sharding, tree)
