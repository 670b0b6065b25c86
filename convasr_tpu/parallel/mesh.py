"""Device mesh and sharding helpers.

Replaces the reference's NCCL/Gloo process groups (train.py:852-874) with SPMD
over a `jax.sharding.Mesh`. The acoustic models are ~20-100M-param conv nets,
so the production strategy is data parallelism over ICI (SURVEY.md §2.2):
parameters replicated, batches sharded on the 'data' axis, gradient psum
inserted by XLA/GSPMD. A 'model' axis is kept in the mesh signature for
future tensor-parallel experiments; it is size 1 by default.

Under jit+GSPMD, batch-norm statistics reduced over the sharded batch axis
are automatically GLOBAL means — i.e. SyncBatchNorm semantics
(models.py:757-758) fall out for free; no wrapper needed.
"""
import typing

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: typing.Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n_data = n_data if n_data is not None else len(devices) // n_model
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    mesh_devices = mesh_utils.create_device_mesh(
        (n_data, n_model), devices=devices[:n_data * n_model])
    return Mesh(mesh_devices, axis_names=('data', 'model'))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put a pytree of host arrays with batch-dim sharding."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)


def state_shardings(mesh: Mesh, state, min_channels: int = 256):
    """Per-leaf shardings for a TrainState: wide trailing (channel) dims are
    sharded over the 'model' axis, everything else replicated.

    This is the optional tensor-parallel layout: JasperNet's wide blocks
    (512-1024 channels) split across the model axis, GSPMD propagates the
    activation shardings and inserts the collectives. With model axis size 1
    everything is replicated (pure data parallelism).
    """
    n_model = mesh.shape['model']

    def rule(leaf):
        shape = getattr(leaf, 'shape', ())
        if (n_model > 1 and len(shape) >= 1 and shape[-1] >= min_channels
                and shape[-1] % n_model == 0):
            return NamedSharding(mesh, P(*([None] * (len(shape) - 1) + ['model'])))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, state)


def process_local_batch_slice(global_batch_size: int) -> slice:
    """Which rows of the global batch this host feeds (multi-host SPMD)."""
    per_process = global_batch_size // jax.process_count()
    start = jax.process_index() * per_process
    return slice(start, start + per_process)


def init_distributed(coordinator_address: str, num_processes: int, process_id: int,
                     cpu_devices_per_process: int = 0, timeout: int = None):
    """Multi-process runtime init (replaces dist.init_process_group(tcp://...),
    reference train.py:852-874). Must run before first backend use.

    cpu_devices_per_process > 0 forces that many virtual CPU devices per
    process — the CI path for testing true multi-process SPMD without a pod.
    """
    if cpu_devices_per_process:
        jax.config.update('jax_platforms', 'cpu')
        jax.config.update('jax_num_cpu_devices', cpu_devices_per_process)
    kw = dict(initialization_timeout=timeout) if timeout else {}
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes, process_id=process_id,
                               **kw)


def allgather_bytes(data: bytes) -> typing.List[bytes]:
    """Gather a variable-length byte blob from every process (replaces the
    reference's shape-padded all_gather + TensorBackedStringArray.synchronize,
    utils.py:193-211, 242-251): allgather lengths first, zero-pad to the max,
    allgather payloads, strip."""
    import numpy as np
    from jax.experimental import multihost_utils
    if jax.process_count() == 1:
        return [data]
    lens = multihost_utils.process_allgather(np.asarray([len(data)], np.int32))
    lens = np.asarray(lens).reshape(-1)
    m = max(int(lens.max()), 1)
    buf = np.zeros(m, np.uint8)
    buf[:len(data)] = np.frombuffer(data, np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    return [bytes(gathered[r, :int(lens[r])].tobytes()) for r in range(len(lens))]


def barrier(name: str = 'convasr'):
    """Cross-process sync point (replaces dist.barrier, train.py:177,613,636)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def make_global_batch(mesh: Mesh, batch: dict, spec: typing.Optional[P] = None) -> dict:
    """Assemble the global on-device batch from this process's local rows.

    Single-process: a plain device_put with batch-dim sharding. Multi-process:
    `jax.make_array_from_process_local_data` — each host contributes its
    (per_host_B, ...) rows and the result is the (world*per_host_B, ...)
    global jax.Array sharded over the 'data' mesh axis. This is the correct
    multi-host feed (plain device_put fails when some mesh devices are
    non-addressable).
    """
    sharding = batch_sharding(mesh) if spec is None else NamedSharding(mesh, spec)
    if jax.process_count() > 1:
        import numpy as np
        return jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(sharding, np.asarray(a)),
            batch)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)
