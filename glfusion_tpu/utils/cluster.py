"""Cluster environment helpers (reference ``utils/tools.py``), JAX runtime.

The reference parses PMI/OMPI/Azure-Batch env vars to size a (never-used)
torch.distributed launch. The TPU-native equivalent keeps the same env-var
contract for MPI-style launchers but resolves through the JAX distributed
runtime: ``jax.process_count()`` / ``jax.process_index()`` are the source of
truth once ``initialize_distributed()`` has run.
"""

from __future__ import annotations

import os

import jax


def _env_world_size() -> int | None:
    """World size from launcher env vars alone (no backend touch)."""
    for var in ("PMI_SIZE", "OMPI_COMM_WORLD_SIZE"):
        if os.environ.get(var) is not None:
            return int(os.environ[var] or 1)
    return None


def get_world_size() -> int:
    """Process count (reference utils/tools.py:5-14)."""
    ws = _env_world_size()
    return ws if ws is not None else jax.process_count()


def get_global_rank() -> int:
    """Global process rank (reference utils/tools.py:17-26)."""
    for var in ("PMI_RANK", "OMPI_COMM_WORLD_RANK"):
        if os.environ.get(var) is not None:
            return int(os.environ[var] or 0)
    return jax.process_index()


def get_local_rank() -> int:
    """Node-local rank (reference utils/tools.py:29-38)."""
    for var in ("MPI_LOCALRANKID", "OMPI_COMM_WORLD_LOCAL_RANK"):
        if os.environ.get(var) is not None:
            return int(os.environ[var] or 0)
    return 0


def get_master_ip() -> str:
    """Coordinator address (reference utils/tools.py:41-46, plus the
    conventional ``MASTER_ADDR`` so non-Azure MPI launches can name their
    coordinator)."""
    if os.environ.get("MASTER_ADDR"):
        return os.environ["MASTER_ADDR"]
    if os.environ.get("AZ_BATCH_MASTER_NODE") is not None:
        return os.environ["AZ_BATCH_MASTER_NODE"].split(":")[0]
    if os.environ.get("AZ_BATCHAI_MPI_MASTER_NODE") is not None:
        return os.environ["AZ_BATCHAI_MPI_MASTER_NODE"]
    return "127.0.0.1"


def initialize_distributed(port: int = 23455) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize`` with the same
    coordinator discovery the reference computed (``main.py:953``) but never
    used. No-op for single-process runs.
    """
    # Guard on the LAUNCHER env vars only: jax.process_count() would
    # initialize the local XLA backend, and jax.distributed.initialize must
    # run before any backend use — touching it here would make multi-host
    # bring-up permanently impossible in this process.
    ws = _env_world_size()
    if ws is None or ws <= 1:
        return
    # rank must come from the launcher env here: get_global_rank()'s
    # jax.process_index() fallback would initialize the local backend
    # BEFORE jax.distributed.initialize (see comment above) and return 0
    # on every process
    rank = None
    for var in ("PMI_RANK", "OMPI_COMM_WORLD_RANK"):
        if os.environ.get(var) is not None:
            rank = int(os.environ[var] or 0)
            break
    if rank is None:
        raise RuntimeError(
            f"world size {ws} detected but no rank env var "
            f"(PMI_RANK/OMPI_COMM_WORLD_RANK) is set — cannot join the "
            f"distributed runtime")
    master = get_master_ip()
    if master == "127.0.0.1" and rank != 0:
        # correct for single-HOST multi-process launches (the 2-process
        # tests); on a multi-node launch this process would dial its own
        # localhost and hang at rendezvous — say so before it does
        import sys
        print(
            "[glfusion] distributed init: no coordinator address found "
            "(MASTER_ADDR / Azure Batch vars unset) — assuming all "
            f"{ws} processes share this host and dialing 127.0.0.1:{port}; "
            "multi-NODE launches must set MASTER_ADDR",
            file=sys.stderr, flush=True)
    jax.distributed.initialize(
        coordinator_address=f"{master}:{port}",
        num_processes=ws,
        process_id=rank,
    )
    if jax.process_count() > 1:
        # Establish the cross-process collective plumbing NOW, while the
        # processes are within seconds of each other. Deferring the first
        # collective to after model build lets arrival skew grow past the
        # transport's ~30 s rendezvous window (compile times differ per
        # process on a contended host) and the gloo/ICI context init fails.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("glfusion:bringup")
