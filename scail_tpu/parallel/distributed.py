"""Multi-host bring-up (reference: arguments.py:241-339 initialize_distributed).

The reference initializes torch.distributed/NCCL from RANK/WORLD_SIZE/
MASTER_ADDR env (+OpenMPI adoption, sample_video.py:511-513).  The JAX
equivalent is `jax.distributed.initialize`, after which `jax.devices()`
spans all hosts and the ('data','seq','model') mesh is built globally.
"""

from __future__ import annotations

import os

from scail_tpu.utils.logging import print_rank0


def initialize_distributed(coordinator_address: str = None,
                           num_processes: int = None,
                           process_id: int = None) -> bool:
    """Initialize multi-host JAX if the environment calls for it.

    Follows the reference's env contract: explicit args win, then
    MASTER_ADDR/MASTER_PORT + WORLD_SIZE/RANK (also adopting OpenMPI's
    OMPI_COMM_WORLD_* like sample_video.py:511-513), else no-op (TPU pods
    under standard launchers auto-configure with no arguments).
    Returns True when distributed mode is active.
    """
    import jax

    for src, dst in (("OMPI_COMM_WORLD_SIZE", "WORLD_SIZE"),
                     ("OMPI_COMM_WORLD_RANK", "RANK")):
        if src in os.environ and dst not in os.environ:
            os.environ[dst] = os.environ[src]

    world = num_processes or int(os.environ.get("WORLD_SIZE", "1"))
    if world <= 1:
        return False

    kwargs = {}
    addr = coordinator_address or (
        f"{os.environ.get('MASTER_ADDR', '')}:{os.environ.get('MASTER_PORT', '1234')}"
        if os.environ.get("MASTER_ADDR") else None
    )
    if addr:
        kwargs = dict(
            coordinator_address=addr,
            num_processes=world,
            process_id=(process_id if process_id is not None
                        else int(os.environ.get("RANK", "0"))),
        )
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # CPU cross-process collectives need an explicit implementation
        # (the multi-host CPU test path; TPU pods use ICI natively)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(**kwargs)
    print_rank0(
        f"jax.distributed initialized: {jax.process_count()} processes, "
        f"{jax.device_count()} devices")
    return True
