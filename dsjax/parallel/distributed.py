"""Multi-host bootstrap + elastic recovery glue.

The reference's multi-node story is TorchElastic + etcd rendezvous with NFS
checkpoints and restart-on-preemption (reference: README.md:154-189,
kubernetes/train.yaml:1-52). The TPU-native equivalent needs no external
rendezvous service: `jax.distributed.initialize` discovers peers from the
TPU pod metadata (or explicit coordinator address for CPU/GPU fleets), SPMD
programs synchronize through the runtime itself, and elastic recovery is
restart + orbax auto-resume (dsjax.train.checkpoint.find_latest_checkpoint_dir
+ load_auto_checkpoint=true, mirroring reference checkpoint.py:34-46).

Failure detection: the TPU runtime aborts all hosts when any host dies
(fail-stop), the supervisor (GKE Job / k8s manifest under kubernetes/)
restarts the job, and training resumes from the newest checkpoint — the
same operational loop as the reference's ElasticJob, minus etcd.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX. No-ops on single-process setups.

    On TPU pods all arguments are discovered automatically. For manual
    fleets pass coordinator_address="host:port", num_processes, process_id
    (or set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    # do NOT probe jax.process_count() here: it would initialize the XLA
    # backend, after which jax.distributed.initialize refuses to run
    if jax.distributed.is_initialized():
        return
    if coordinator_address is None and not _on_tpu_pod():
        return  # single host
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError) as e:
        # already initialized or single-host TPU
        if "already" not in str(e).lower():
            raise


def _on_tpu_pod() -> bool:
    return bool(os.environ.get("TPU_WORKER_HOSTNAMES")
                or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0
