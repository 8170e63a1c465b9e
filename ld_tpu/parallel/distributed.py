"""Multi-host initialization + cross-host utilities.

Replaces the reference's launcher zoo (torch.distributed.launch / slurm /
mpi rendezvous, SURVEY.md §5.8): on TPU pods every host runs THE SAME
program; `jax.distributed.initialize` wires DCN coordination and
`jax.devices()` then spans the whole slice, so the existing mesh/train-step
code scales unchanged.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> dict:
    """Initialize multi-host JAX if requested via args or env.

    No-op on a single host. Env contract mirrors jax.distributed:
    COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID (or TPU pod metadata,
    which jax.distributed reads automatically on Cloud TPU).
    """
    coordinator_address = coordinator_address or os.environ.get(
        'COORDINATOR_ADDRESS')
    if coordinator_address or os.environ.get('TPU_WORKER_HOSTNAMES'):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes or int(os.environ.get(
                    'NUM_PROCESSES', '0')) or None,
                process_id=process_id if process_id is not None else (
                    int(os.environ['PROCESS_ID'])
                    if 'PROCESS_ID' in os.environ else None))
        except RuntimeError as e:
            # 'already initialized' is benign; anything else (failed
            # coordinator handshake) must NOT silently fall back to
            # single-host — that trains disjoint models per host
            if 'already initialized' not in str(e).lower():
                raise
        # ValueError (malformed PROCESS_ID / NUM_PROCESSES env) propagates
    return dict(process_index=jax.process_index(),
                process_count=jax.process_count(),
                local_devices=len(jax.local_devices()),
                global_devices=len(jax.devices()))


def is_main_process() -> bool:
    return jax.process_index() == 0


def all_gather_host(array: np.ndarray):
    """Host-level allgather of numpy results (eval collection across hosts).

    Parity: /root/reference/mmdet/apis/test.py:117-189 collect_results —
    on TPU this is `multihost_utils.process_allgather`."""
    if jax.process_count() == 1:
        return array
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(array))
