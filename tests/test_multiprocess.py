"""Real 2-process multi-host integration test (CPU, 4 faked devices each).

Spawns two fresh python processes that join a jax.distributed cluster over a
localhost coordinator, each feeding only its host-local batch shard
(Trainer.put_batch -> jax.make_array_from_process_local_data), and asserts
per-step loss equality with a single-process 8-device run of the identical
global batch — validating the multi-host input feeding + validate() path
end to end (reference story: TorchElastic multi-node DDP, README.md:154-189).
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.slow  # integration-scale; fast path: -m 'not slow'

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train_matches_single_process():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multiproc_worker.py"),
             str(pid), str(port)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "DONE" in out, f"worker {pid} incomplete:\n{out}"

    def parse(out, tag, n):
        m = re.search(rf"^{tag}((?: -?\d+\.\d+){{{n}}})$", out, re.M)
        assert m, f"no {tag} line in:\n{out}"
        return [float(x) for x in m.group(1).split()]

    losses = [parse(o, "LOSS", 2) for o in outs]
    wercer = [parse(o, "WERCER", 2) for o in outs]
    # both hosts see the same global loss / globally-reduced metrics
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
    np.testing.assert_allclose(wercer[0], wercer[1], rtol=1e-6)

    # single-process 8-device reference run on the identical global batch
    if len(jax.devices()) < 8:
        pytest.skip("parent needs 8 faked devices for the reference run")
    from dsjax.config import TrainConfig, compose
    from dsjax.labels import DEFAULT_LABELS
    from dsjax.parallel.mesh import make_mesh
    from dsjax.train.loop import Trainer
    from tests.multiproc_common import global_batch, worker_cfg_overrides

    cfg = compose(TrainConfig, worker_cfg_overrides())
    trainer = Trainer(cfg, DEFAULT_LABELS,
                      mesh=make_mesh(8, 1, devices=jax.devices()[:8]))
    state = trainer.init_state()
    gb = global_batch()
    state, ref1 = trainer.train_step(state, gb)
    state, ref2 = trainer.train_step(state, gb)
    np.testing.assert_allclose(losses[0], [float(ref1), float(ref2)],
                               rtol=1e-5)
    ref_wer, ref_cer = trainer.validate(state, [gb])
    np.testing.assert_allclose(wercer[0], [ref_wer, ref_cer], rtol=1e-6,
                               atol=1e-9)
