"""Multi-host launch + partition striding — the cluster layer.

Replaces the reference's grid backends (Plgd/Grid{Pbs,Lsf,Sge,Slurm}.pm) and its
`-mn node_id num_nodes` partition striding (src/consensus/main.c:71-73,
necat.pl:301,661,1065): instead of per-volume qsub/bsub jobs communicating over a
shared filesystem, all hosts join ONE multi-controller JAX program
(jax.distributed) and each host owns a deterministic stripe of the work
(partitions of templates / volumes / contigs). Collectives ride ICI within a
host's chips and DCN across hosts.

Launch on each host (same command, different PROCESS_ID), e.g. under mpirun or
any cluster scheduler:

    NECAT_TPU_COORDINATOR=host0:9876 NECAT_TPU_NUM_PROCS=4 NECAT_TPU_PROC_ID=$RANK \
        python -m necat_tpu.pipeline.cli correct my.cfg

The pipeline stages call `host_stripe` to pick their share and `is_coordinator`
to gate file writes; single-process runs (the default) need no env vars.
"""

from __future__ import annotations

import os

import numpy as np


def init_multihost() -> tuple[int, int]:
    """Join the multi-controller program if the launch env requests it.

    Reads NECAT_TPU_COORDINATOR / NECAT_TPU_NUM_PROCS / NECAT_TPU_PROC_ID (the
    role of the reference's grid submit + `-mn i n` arguments). Returns
    (process_id, num_processes); (0, 1) when single-process. Idempotent.
    """
    import jax

    coord = os.environ.get("NECAT_TPU_COORDINATOR")
    if not coord:
        return 0, 1
    n = int(os.environ.get("NECAT_TPU_NUM_PROCS", "1"))
    pid = int(os.environ.get("NECAT_TPU_PROC_ID", "0"))
    # idempotence must be checked WITHOUT touching the backend —
    # jax.process_count() would initialise XLA and forbid initialize()
    if n > 1 and not jax.distributed.is_initialized():
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=n, process_id=pid)
    return jax.process_index(), jax.process_count()


def is_coordinator() -> bool:
    import jax

    return jax.process_index() == 0


def host_stripe(n_items: int, process_id: int | None = None,
                num_processes: int | None = None) -> np.ndarray:
    """Indices of the items this host owns: i, i+n, i+2n, ... — exactly the
    reference's `-mn node_id num_nodes` partition striding (consensus/main.c:71-73,
    which strides partition ids rather than blocking them, so long/short
    partitions spread evenly across nodes)."""
    import jax

    if process_id is None:
        process_id = jax.process_index()
    if num_processes is None:
        num_processes = jax.process_count()
    return np.arange(process_id, n_items, num_processes)


def barrier(name: str = "necat") -> None:
    """Cross-host sync point (shared-filesystem handoff between stages — the
    role of the reference's serialRunJobs waiting for all grid jobs of a stage,
    Plgd/Project.pm). No-op single-process."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def global_mesh(axis: str = "d"):
    """Mesh over ALL devices in the multi-controller program (local chips on
    ICI, cross-host edges on DCN). Single-host this equals parallel.mesh.make_mesh."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))
