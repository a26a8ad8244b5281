"""Device-mesh parallelism.

Replaces the reference's DDP/NCCL stack (slowfast/utils/distributed.py,
multiprocessing.py; SURVEY.md §2.5) with single-controller JAX:

  * reference ``torch.multiprocessing.spawn`` + process groups
    -> one process, a ``jax.sharding.Mesh`` over all devices;
  * reference DDP gradient all-reduce -> automatic ``psum`` inserted by
    XLA when the batch axis is sharded and params are replicated;
  * reference ``du.all_gather`` of predictions -> outputs stay sharded
    on device and are gathered by ``jax.device_get`` at the host, or
    ensembled on device (vtm/eval/meters.py).

The mesh currently has a single ``data`` axis (the reference's only
parallelism is data parallel — SURVEY.md §5 long-context note); the
axis layout leaves room for a future ``model``/``seq`` axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(cfg) -> None:
    """Multi-host bring-up: map the reference's launch topology
    (``--num_shards/--shard_id/--init_method tcp://host:port``,
    slowfast/utils/{multiprocessing.py:9-62, parser.py:31-48}) onto
    ``jax.distributed.initialize``. One process per HOST (each host
    owns all its local chips — the single-controller analog of the
    reference's one-process-per-GPU spawn); collectives ride ICI within
    a slice and DCN across shards. No-op for NUM_SHARDS == 1."""
    if cfg.NUM_SHARDS <= 1:
        return
    coordinator = cfg.INIT_METHOD
    for prefix in ("tcp://", "env://"):
        if coordinator.startswith(prefix):
            coordinator = coordinator[len(prefix):]
    jax.distributed.initialize(
        # "" (unset / the torch "env://" convention) must become None so
        # jax auto-detects the coordinator from the environment instead
        # of dialing an empty address
        coordinator_address=coordinator or None,
        num_processes=cfg.NUM_SHARDS,
        process_id=cfg.SHARD_ID,
    )


def make_mesh(
    devices: Optional[Sequence] = None,
    axis_names: Sequence[str] = ("data",),
    model_parallel: int = 1,
    batch_cap: Optional[int] = None,
) -> Mesh:
    """1-D data mesh, or a 2-D ('data', 'model') mesh when
    ``model_parallel`` > 1 (tensor parallelism over ICI — see
    vtm/parallel/sharding.py for the parameter cuts).

    ``batch_cap`` caps the data axis at the largest divisor of the
    per-step batch size that fits the visible devices — the
    single-controller analog of the reference *choosing* NUM_GPUS so
    that ``BATCH_SIZE % NUM_GPUS == 0`` holds (the reference asserts
    this at config time, slowfast/config/defaults.py:1266-1270; we know
    the device count only here). Unused devices are simply left out of
    the mesh, exactly as unused GPUs would be."""
    devices = list(devices if devices is not None else jax.devices())
    if batch_cap is not None:
        avail = max(1, len(devices) // max(1, model_parallel))
        ways = max(d for d in range(1, avail + 1) if batch_cap % d == 0)
        used = ways * max(1, model_parallel)
        if used < len(devices):
            if jax.process_count() > 1:
                # truncating the global device list would strip some
                # hosts' addressable devices from the mesh and fail deep
                # inside device_put/collectives — surface the config
                # error instead (the reference asserts this up front)
                raise ValueError(
                    f"batch size {batch_cap} is not divisible by the "
                    f"{len(devices) // max(1, model_parallel)}-way data "
                    "axis and multi-host meshes cannot drop devices; "
                    "choose a divisible batch size"
                )
            import logging

            logging.getLogger(__name__).warning(
                "batch size %d caps the data axis at %d of %d available "
                "device(s) — %d device(s) left idle (pick a batch "
                "divisible by the device count to use them all)",
                batch_cap, ways, avail, len(devices) - used,
            )
        devices = devices[:used]
    if model_parallel > 1:
        assert len(devices) % model_parallel == 0, (
            f"{len(devices)} devices not divisible by model_parallel={model_parallel}"
        )
        assert tuple(axis_names) in (("data",), ("data", "model")), (
            f"model_parallel>1 uses ('data', 'model') axes, got {axis_names}"
        )
        arr = np.array(devices).reshape(-1, model_parallel)
        return Mesh(arr, axis_names=("data", "model"))
    if tuple(axis_names) == ("data", "model"):
        # the documented 2-D layout spelled explicitly: trivial model axis
        return Mesh(np.array(devices).reshape(-1, 1), axis_names=("data", "model"))
    if len(axis_names) != 1:
        raise NotImplementedError("pass model_parallel= for a 2-D mesh")
    return Mesh(np.array(devices), axis_names=tuple(axis_names))


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place a host batch onto the mesh, sharded along the leading axis."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_parallel_apply(mesh: Mesh, fn):
    """jit ``fn(params, batch)`` with params replicated and batch sharded
    on the data axis; XLA inserts the collectives."""
    return jax.jit(
        fn,
        in_shardings=(replicated_sharding(mesh), batch_sharding(mesh)),
        out_shardings=None,
    )


def pad_to_multiple(x: np.ndarray, multiple: int):
    """Pad the leading axis up to a multiple (uneven final eval batches
    can't shard across the mesh otherwise). Returns (padded, n_valid)."""
    n = x.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = np.repeat(x[:1], rem, axis=0)
    return np.concatenate([x, pad], axis=0), n


def process_allgather(tree):
    """Host-side all-gather across controller processes — the analog of
    the reference's pickled gloo `all_gather_unaligned`
    (slowfast/utils/distributed.py:150-264). Identity in the
    single-controller case."""
    import jax

    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)
