"""Multi-host bootstrap glue: single-host no-op behavior and env plumbing."""

import os

from dsjax.parallel import distributed


def test_initialize_noop_single_host(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID",
                "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    distributed.initialize()  # must be a no-op, not raise
    assert distributed.is_main_process()


def test_on_tpu_pod_detection(monkeypatch):
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    assert not distributed._on_tpu_pod()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host1,host2")
    assert distributed._on_tpu_pod()
