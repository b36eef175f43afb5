"""Device mesh + sharding helpers.

The reference scales with PyTorch-Lightning DDP over NCCL
(/root/reference/run.py:18,99-100). The TPU-native equivalent is SPMD:
one jitted train step over a ``jax.sharding.Mesh``; the batch is sharded
over the ``data`` axis, parameters are replicated (or sharded over
``model`` for the wide CT-VAE layers), and XLA inserts the gradient
all-reduce over ICI automatically from the sharding annotations.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
REPLICA_AXIS = "replica"   # maps across pod slices (DCN) on a hybrid mesh


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              model_axis: int = 1) -> Mesh:
    """Mesh over all (or given) devices: ``(data, model)``. ``model_axis=1``
    gives pure data parallelism — all the reference needs (SURVEY.md §2.5);
    a larger ``model_axis`` shards the wide CT/discoverer matmuls too."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_axis == 0, (n, model_axis)
    arr = np.array(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def make_hybrid_mesh(dcn_replicas: int,
                     model_axis: int = 1,
                     devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Multi-slice pod mesh ``(replica, data, model)``.

    The ``replica`` axis maps ACROSS slices (DCN links); ``data`` and
    ``model`` stay INSIDE a slice (ICI links). The batch is sharded over
    (replica, data) jointly — see ``batch_sharding`` — so XLA's gradient
    all-reduce decomposes hierarchically: reduce-scatter/all-gather
    legs inside each slice ride ICI and only the per-slice partial sums
    cross DCN once per step. FSDP (``fsdp_shardings``) keys off the
    ``data`` axis only, so ZeRO weight all-gathers never touch DCN —
    the scaling-book recipe for DP-across-slices.

    When the devices expose slice topology (real multi-slice TPU:
    ``device.slice_index``), the mesh is built with
    ``mesh_utils.create_hybrid_device_mesh`` so axis<->link assignment is
    physically correct; otherwise (CPU tests, single-slice chips) the
    devices are reshaped in enumeration order — same SPMD program,
    logical-only topology.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % (dcn_replicas * model_axis) == 0, (n, dcn_replicas, model_axis)
    ici_data = n // (dcn_replicas * model_axis)
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    if None not in slice_ids and len(slice_ids) == dcn_replicas:
        from jax.experimental import mesh_utils
        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, ici_data, model_axis),
            dcn_mesh_shape=(dcn_replicas, 1, 1),
            devices=devices)
    else:
        arr = np.array(devices).reshape(dcn_replicas, ici_data, model_axis)
    return Mesh(arr, (REPLICA_AXIS, DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split over the data axis — jointly over
    (replica, data) on a hybrid multi-slice mesh."""
    if REPLICA_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P((REPLICA_AXIS, DATA_AXIS)))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, jax.Array], mesh: Mesh) -> Dict[str, jax.Array]:
    """Device-put a host batch with the leading dim sharded over ``data``.

    Multi-host: each process passes its LOCAL slice of the global batch
    (the datamodule host-shards, datamodule.py:140-147) and the global
    array is assembled across processes — the SPMD equivalent of the
    reference's DistributedSampler feeding per-rank DDP replicas
    (/root/reference/datasets/transition.py:175-178)."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(sh, np.asarray(v))
                for k, v in batch.items()}
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def put_replicated(tree, mesh: Mesh):
    """Replicate a host pytree over every device of the (possibly
    multi-process) mesh. Each process must hold an identical copy (same
    seed init or same restored checkpoint)."""
    sh = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda a: jax.make_array_from_process_local_data(
                sh, np.asarray(a)), tree)
    return jax.device_put(tree, sh)


# ---------------------------------------------------------------------------
# Parameter sharding over the model axis (tensor parallelism).
#
# The reference has no TP (SURVEY.md §2.5), but the wide CT tensors are
# the natural candidates when scaling past pure DP: the per-action
# discoverer stacks [A+1, N, H] (hidden axis) and the VQ codebooks
# [K, D/C] (codebook-entry axis). Everything else is replicated.
# ---------------------------------------------------------------------------

# leaf-name -> which axis of the leaf to split over the `model` mesh axis
DEFAULT_TP_RULES: Dict[str, int] = {
    "disc_w1l": 2,     # [A+1, N, H] — split hidden
    "disc_w1r": 2,
    "disc_b1": 1,
    "embedding": 0,    # [K, D] codebooks — split entries
}


def param_shardings(params, mesh: Mesh,
                    rules: Optional[Dict[str, int]] = None):
    """Pytree of NamedShardings: leaves whose *name* matches a rule are
    split over the ``model`` axis at the ruled dimension, everything
    else replicated. With a trivial model axis (size 1) this degenerates
    to full replication."""
    rules = DEFAULT_TP_RULES if rules is None else rules
    model_size = mesh.shape[MODEL_AXIS]

    def one(path, leaf):
        name = str(path[-1].key) if hasattr(path[-1], "key") else ""
        axis = rules.get(name)
        if (axis is None or model_size == 1
                or leaf.ndim <= axis
                or leaf.shape[axis] % model_size != 0):
            return NamedSharding(mesh, P())
        spec = [None] * leaf.ndim
        spec[axis] = MODEL_AXIS
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params, mesh: Mesh,
                 rules: Optional[Dict[str, int]] = None):
    """Device-put params with ``param_shardings``."""
    return jax.tree_util.tree_map(
        jax.device_put, params, param_shardings(params, mesh, rules))


# ---------------------------------------------------------------------------
# Fully-sharded data parallelism (FSDP / ZeRO-3).
#
# Beyond the reference (its biggest run is 5-GPU DDP with replicated
# params, /root/reference/configs/ct_mcq_vae.yaml:40). For models whose
# params + Adam moments outgrow one chip's HBM, shard every large leaf
# over the *data* axis: XLA's SPMD partitioner inserts the all-gather
# before each use and the reduce-scatter on the gradients — the
# scaling-book ZeRO recipe, expressed purely as sharding annotations.
# Composes with the TP rules above: a leaf already split over ``model``
# gets its largest *remaining* axis split over ``data``. On a hybrid
# multi-slice mesh (make_hybrid_mesh) the ``data`` axis is intra-slice
# by construction, so the ZeRO weight all-gathers stay on ICI; the
# ``replica`` (DCN) axis carries only the per-step gradient reduction.
# ---------------------------------------------------------------------------

def fsdp_shardings(params, mesh: Mesh, min_size: int = 1 << 12,
                   tp_rules: Optional[Dict[str, int]] = None):
    """Pytree of NamedShardings sharding each large leaf over ``data``.

    Every leaf with ``size >= min_size`` has its largest axis that is
    divisible by the data-axis size split over ``data`` (ZeRO-3);
    smaller or indivisible leaves stay replicated. ``tp_rules`` (same
    schema as ``DEFAULT_TP_RULES``; pass ``{}`` to disable TP) first
    claims its axis for ``model`` when that mesh axis is non-trivial.
    """
    tp_rules = DEFAULT_TP_RULES if tp_rules is None else tp_rules
    data_size = mesh.shape[DATA_AXIS]
    model_size = mesh.shape[MODEL_AXIS]

    def one(path, leaf):
        name = str(path[-1].key) if hasattr(path[-1], "key") else ""
        spec = [None] * leaf.ndim
        tp_axis = tp_rules.get(name)
        if (tp_axis is not None and model_size > 1 and leaf.ndim > tp_axis
                and leaf.shape[tp_axis] % model_size == 0):
            spec[tp_axis] = MODEL_AXIS
        if data_size > 1 and leaf.size >= min_size:
            free = [a for a in range(leaf.ndim)
                    if spec[a] is None and leaf.shape[a] % data_size == 0]
            if free:
                spec[max(free, key=lambda a: leaf.shape[a])] = DATA_AXIS
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params_fsdp(params, mesh: Mesh, min_size: int = 1 << 12,
                      tp_rules: Optional[Dict[str, int]] = None):
    """Device-put params with ``fsdp_shardings``. Optimizer states built
    from the result (``tx.init(params)``) inherit the same layout —
    sharding the Adam moments is where ZeRO's memory win lives."""
    return jax.tree_util.tree_map(
        jax.device_put, params,
        fsdp_shardings(params, mesh, min_size, tp_rules))


# ---------------------------------------------------------------------------
# Sequence parallelism (activation sharding) for the CT attention domain.
#
# The reference has no SP (SURVEY.md §2.5) — its only sequence-like axis
# is the S = K*h*w causal-variable axis inside CausalTransition, whose
# O(S^2) pairwise scoring / GATv2 attention the reference handles with a
# comp-vs-mem switch on ONE device (ct_mcq_vae.py:140-174). The
# TPU-native scaling move is to split that domain ACROSS chips: pin the
# target-node axis of the [B,S,T,H(,F)] attention/pairwise workspaces to
# the ``model`` mesh axis and let XLA partition the producing fusions —
# each chip walks only its T-block, and the only communication is the
# small [B,T,HF] node-feature all-gather between GAT layers (Megatron-SP
# applied to graph attention). Value-identical to the unsharded program.
# ---------------------------------------------------------------------------

def _context_mesh() -> Optional[Mesh]:
    """The mesh of the surrounding ``with mesh:`` block (visible at jit
    trace time), or None when tracing outside any mesh context."""
    try:
        from jax._src.mesh import thread_resources
        m = thread_resources.env.physical_mesh
        return None if m.empty else m
    except Exception:
        return None


def shard_dim(x: jax.Array, dim: int, axis_name: Optional[str]) -> jax.Array:
    """Constrain ONE dim of ``x`` to mesh axis ``axis_name``, leaving all
    other dims UNCONSTRAINED (so batch/data sharding propagates freely).

    A no-op when ``axis_name`` is falsy, when tracing outside a mesh
    context, or when the context mesh lacks the axis / has it at size 1 —
    so model code can call this unconditionally and stay runnable on a
    single device and in unsharded unit tests. Uneven dims are fine
    (GSPMD pads): the common CT target axis is T = S + 1 support node.
    """
    if not axis_name:
        return x
    mesh = _context_mesh()
    if mesh is None or mesh.shape.get(axis_name, 1) <= 1:
        return x
    spec = [P.UNCONSTRAINED] * x.ndim
    spec[dim] = axis_name
    return jax.lax.with_sharding_constraint(x, P(*spec))


def pin_state_shardings(step_fn, state):
    """Wrap a ``(state, batch) -> (state, metrics)`` step so the output
    state keeps ``state``'s current sharding layout.

    Under plain propagation XLA is free to return the updated params
    with whatever sharding minimizes this one program — for an FSDP
    state that can silently re-replicate the weights, forfeiting the
    memory win on the very next step. A ``with_sharding_constraint``
    over the output pins the layout (and keeps input-buffer donation
    shape/layout-compatible)."""
    shardings = jax.tree_util.tree_map(lambda a: a.sharding, state)

    def fn(s, batch):
        new_state, metrics = step_fn(s, batch)
        # leaves created eagerly off-mesh (e.g. an optimizer step counter
        # on the default device) carry a SingleDeviceSharding — leave
        # those unconstrained rather than forcing a device-0 gather
        new_state = jax.tree_util.tree_map(
            lambda a, sh: (jax.lax.with_sharding_constraint(a, sh)
                           if isinstance(sh, NamedSharding) else a),
            new_state, shardings)
        return new_state, metrics

    return fn
