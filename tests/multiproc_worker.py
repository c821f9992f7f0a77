"""Worker for the 2-process multi-host integration test.

Launched by tests/test_multiprocess.py as a fresh subprocess:

    python tests/multiproc_worker.py <process_id> <coordinator_port>

Each of the 2 workers fakes 4 CPU devices, joins a jax.distributed cluster
(8 global devices), feeds ONLY its host-local shard of a deterministic
global batch through Trainer.put_batch (which assembles the global array
with jax.make_array_from_process_local_data), runs two real train steps +
a validate() pass, and prints the results for the parent to compare against
a single-process 8-device run of the identical global batch.

The two hosts deliberately collate to DIFFERENT time paddings (host 1 trims
its rows to 48 frames; host 0 pads to 64) to exercise the cross-host shape
agreement in dsjax.parallel.multihost.agree_shapes.
"""

import os
import sys

pid = int(sys.argv[1])
port = int(sys.argv[2])

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("JAX_PLATFORM_NAME", None)

import jax  # noqa: E402

# the axon TPU plugin overrides the JAX_PLATFORMS env var; jax.config wins
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4, jax.local_device_count()

import numpy as np  # noqa: E402

from dsjax.config import TrainConfig, compose  # noqa: E402
from dsjax.data.dataset import Batch  # noqa: E402
from dsjax.labels import DEFAULT_LABELS  # noqa: E402
from dsjax.parallel.mesh import make_mesh  # noqa: E402
from dsjax.train.loop import Trainer  # noqa: E402
from tests.multiproc_common import global_batch, worker_cfg_overrides  # noqa: E402

cfg = compose(TrainConfig, worker_cfg_overrides())
mesh = make_mesh(8, 1)
trainer = Trainer(cfg, DEFAULT_LABELS, mesh=mesh)
state = trainer.init_state()

gb = global_batch()
lo, hi = pid * 4, (pid + 1) * 4
# host 1's rows are all <= 48 valid frames: trim the padding so the two
# hosts disagree on local T (48 vs 64) and agree_shapes must reconcile
t_local = 48 if pid == 1 else 64
local = Batch(gb.inputs[lo:hi, :, :t_local],
              gb.input_lengths[lo:hi],
              gb.targets[lo:hi],
              gb.target_lengths[lo:hi],
              gb.input_percentages[lo:hi],
              valid=gb.valid[lo:hi] if gb.valid is not None else None)

state, loss1 = trainer.train_step(state, local)
state, loss2 = trainer.train_step(state, local)
print(f"LOSS {float(loss1):.6f} {float(loss2):.6f}", flush=True)

wer, cer = trainer.validate(state, [local])
print(f"WERCER {wer:.6f} {cer:.6f}", flush=True)
print("DONE", flush=True)
