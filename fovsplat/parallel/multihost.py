"""Multi-host orchestration: jax.distributed wiring + global-mesh helpers.

The reference is single-GPU/single-process (SURVEY.md §2.5/§5.8); this is
the new-design DCN layer. One process per host initializes the JAX
distributed runtime against a shared coordinator, after which
`jax.devices()` is the GLOBAL device list and every `shard_map`/`pjit`
over a global mesh runs SPMD across hosts — the same DP train step
(parallel/data_parallel) and tile-sharded renderers (parallel/tile_shard,
parallel/fov_shard) work unchanged; only array *construction* differs
(each process feeds its host-local shard via
`jax.make_array_from_process_local_data`).

BASELINE.md's scaling bar is defined at 2 hosts; tests/test_multihost.py
proves the wiring with a real 2-process CPU-backend run (subprocess
launcher + TCP coordinator on localhost), which exercises the identical
code path a 2-host v5e slice would (ICI collectives become DCN/TCP
transfers on the CPU backend — the mesh/sharding program is the same).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_from_env(env=os.environ) -> bool:
    """Initialize jax.distributed from standard env vars; no-op when
    unset (single-process runs stay untouched).

    Env: FOVSPLAT_COORDINATOR host:port, FOVSPLAT_NUM_PROCESSES,
    FOVSPLAT_PROCESS_ID (also accepts the upstream JAX names
    JAX_COORDINATOR_ADDRESS etc. via jax's own env handling when only
    initialize() is called). Returns True when distributed mode was
    entered."""
    coord = env.get("FOVSPLAT_COORDINATOR")
    if not coord:
        return False
    nproc = int(env["FOVSPLAT_NUM_PROCESSES"])
    pid = int(env["FOVSPLAT_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    return True


def global_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over every device of every process. After
    jax.distributed.initialize, jax.devices() is global; a flat 'data'
    axis keeps the existing DP/tile-shard code paths unchanged across
    hosts (gradient psum and the pair all-to-all ride DCN between hosts,
    ICI within one)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def host_mesh(axes=("hosts", "devices")) -> Mesh:
    """2-D (hosts, devices-per-host) mesh: shard the slow (DCN) axis
    explicitly when a collective should stay intra-host."""
    devs = np.asarray(jax.devices()).reshape(
        jax.process_count(), jax.local_device_count())
    return Mesh(devs, axes)


def to_global(mesh: Mesh, spec: P, host_local) -> jax.Array:
    """Assemble a global jax.Array from this process's host-local data.

    For a replicated spec every process passes the (identical) full
    array; for a sharded spec each process passes only its own rows."""
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(host_local))


def replicate_tree(mesh: Mesh, tree):
    """Replicate a pytree of host-identical arrays onto the global mesh."""
    return jax.tree.map(lambda x: to_global(mesh, P(), x), tree)
