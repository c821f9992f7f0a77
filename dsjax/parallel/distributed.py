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
        if coordinator_address is None:
            # TPU pod: all parameters auto-discovered from pod metadata
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(coordinator_address=coordinator_address,
                                       num_processes=num_processes,
                                       process_id=process_id)
    except (RuntimeError, ValueError) as e:
        msg = str(e).lower()
        # tolerate: already initialized, single-host TPU, or a backend that
        # was already brought up in-process (tests, notebooks) — joining a
        # cluster is impossible then, so continue single-host
        if "already" in msg:
            return
        if "must be called before" in msg:
            import sys

            print("dsjax: XLA backend already initialized; continuing "
                  "single-host (call dsjax.parallel.distributed.initialize "
                  "before any jax use to join a cluster)", file=sys.stderr)
            return
        raise


def _on_tpu_pod() -> bool:
    """True only for MULTI-host TPU pods (a single-chip/single-host TPU VM
    also sets TPU_WORKER_HOSTNAMES, but with one entry — joining a cluster
    there would demand a coordinator address that does not exist)."""
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return len([h for h in hosts.split(",") if h]) > 1 or bool(
        os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0
