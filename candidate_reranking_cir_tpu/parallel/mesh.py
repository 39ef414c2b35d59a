"""Device mesh construction and sharding rules.

The reference has no distributed execution at all (single GPU; SURVEY.md section 2).
This module is the TPU-native scaling layer added on top:

- a 1-D ``('data',)`` mesh for batch-parallel training and corpus-sharded
  retrieval; gradients all-reduce over ICI implicitly through pjit shardings,
- optional FSDP-style parameter sharding over the same axis (large configs):
  parameters whose largest dimension divides the axis size are sharded on it,
- NamedSharding helpers used by the train steps and the retrieval index builder.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, data_axis: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (data_axis,))


def make_mesh_for_batch(batch_size: int, devices=None,
                        data_axis: str = "data") -> Mesh:
    """Mesh over the largest device count that divides batch_size (a batch
    smaller than the device count cannot shard its leading dim)."""
    devices = devices if devices is not None else jax.devices()
    fitted = fit_mesh(make_mesh(devices, data_axis), batch_size, data_axis)
    return fitted if fitted is not None \
        else Mesh(np.asarray(devices[:1]), (data_axis,))


def fit_mesh(mesh: Mesh | None, batch_size: int,
             data_axis: str = "data") -> Mesh | None:
    """Shrink a mesh so its data axis divides ``batch_size`` (a batch smaller
    than the device count cannot shard its leading dim). Returns None when
    only one device fits — callers then skip sharding entirely."""
    if mesh is None:
        return None
    devices = list(mesh.devices.flat)
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    if n <= 1:
        return None
    if n == len(devices):
        return mesh
    return Mesh(np.asarray(devices[:n]), (data_axis,))


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_param_spec(path_leaf_shape, axis_size: int):
    """PartitionSpec for one parameter under FSDP: shard the largest divisible
    axis, else replicate."""
    shape = path_leaf_shape
    if not shape:
        return P()
    # prefer sharding the largest dim that divides the mesh axis
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] >= axis_size and shape[i] % axis_size == 0:
            spec = [None] * len(shape)
            spec[i] = "data"
            return P(*spec)
    return P()


def param_shardings(mesh: Mesh, params, fsdp: bool):
    """Sharding tree for a parameter pytree: replicated, or FSDP-sharded."""
    if not fsdp:
        rep = replicated(mesh)
        return jax.tree.map(lambda _: rep, params)
    axis_size = mesh.shape["data"]
    return jax.tree.map(
        lambda p: NamedSharding(mesh, fsdp_param_spec(p.shape, axis_size)),
        params)


def state_shardings(mesh: Mesh, state, fsdp: bool):
    """Sharding tree for a full TrainState (step/params/opt_state).

    Under FSDP the optimizer moments follow the SAME shape-based rule as the
    parameters (AdamW's mu/nu mirror the param shapes), so optimizer memory
    shrinks by the mesh size too — replicating opt_state would forfeit the
    ZeRO win. Scalars (step, count) replicate.
    """
    if not fsdp:
        rep = replicated(mesh)
        return jax.tree.map(lambda _: rep, state)
    axis_size = mesh.shape["data"]
    return jax.tree.map(
        lambda leaf: NamedSharding(
            mesh, fsdp_param_spec(np.shape(leaf), axis_size)),
        state)


def shard_state(mesh: Mesh, state, fsdp: bool):
    """device_put a TrainState with FSDP-aware shardings."""
    return jax.device_put(state, state_shardings(mesh, state, fsdp))


def shard_batch(mesh: Mesh, batch):
    """device_put a host batch with the leading dim sharded over 'data'."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), batch)
