"""Observability: metrics logger, step timer, profiler hook (CPU)."""

import json
import os

import numpy as np

from dsjax.train.logging import MetricsLogger, StepTimer, profile_steps


def test_metrics_logger(tmp_path):
    ml = MetricsLogger(str(tmp_path))
    ml.log(1, loss=3.5, wer=42.0)
    ml.log(2, loss=3.0)
    ml.close()
    lines = [json.loads(l) for l in open(ml.path)]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 3.5
    assert lines[1]["step"] == 2
    assert "time" in lines[0]


def test_step_timer():
    t = StepTimer(window=3)
    t.start()
    import time

    for _ in range(4):
        time.sleep(0.01)
        t.tick(8)
    assert t.utterances_per_sec > 0
    assert 5 < t.mean_step_ms < 500
    assert len(t.times) == 3  # window


def test_profile_steps(tmp_path):
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: jnp.sum(x * x))
    with profile_steps(str(tmp_path), enabled=True):
        float(f(jnp.arange(128.0)))
    # a plugins/profile dir with trace files must exist
    found = []
    for root, _, files in os.walk(tmp_path):
        found.extend(files)
    assert found, "no profiler trace written"


def test_profile_disabled(tmp_path):
    with profile_steps(str(tmp_path / "off"), enabled=False):
        pass
    assert not os.path.exists(tmp_path / "off")
