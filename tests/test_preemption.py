"""Elastic recovery under hard preemption (reference story: preemptible GKE
nodes + TorchElastic restart + load_auto_checkpoint, README.md:154-189,
kubernetes/train.yaml). A training process is SIGKILLed mid-run after its
first checkpoint lands; a fresh process with load_auto_checkpoint=true must
resume from the saved step (not from scratch) and finish."""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # integration-scale; fast path: -m 'not slow'

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def dataset(tmp_path):
    from dsjax.audio.io import save_wav

    root = tmp_path / "ds"
    (root / "wav").mkdir(parents=True)
    (root / "txt").mkdir()
    rng = np.random.default_rng(0)
    words = ["HELLO WORLD", "GOOD MORNING", "DEEP SPEECH", "JAX ON TPU",
             "OPEN SOURCE", "SPEECH MODEL", "TEST AUDIO", "FINAL SAMPLE"]
    samples = []
    for i in range(8):
        n = 8000 + 1000 * (i % 4)
        y = (0.1 * np.sin(2 * np.pi * 300 * np.arange(n) / 16000)
             + 0.01 * rng.standard_normal(n)).astype(np.float32)
        save_wav(str(root / "wav" / f"s{i}.wav"), y, 16000)
        (root / "txt" / f"s{i}.txt").write_text(words[i])
        samples.append({"wav_path": f"wav/s{i}.wav",
                        "transcript_path": f"txt/s{i}.txt"})
    manifest = root / "manifest.json"
    manifest.write_text(json.dumps({"root_path": str(root),
                                    "samples": samples}))
    return str(manifest)


def _train_cmd(manifest, ckpt_dir):
    return [sys.executable, os.path.join(REPO, "train.py"),
            f"data.train_path={manifest}", f"data.val_path={manifest}",
            "data.batch_size=2", "data.num_workers=0",
            "model.hidden_size=24", "model.hidden_layers=1",
            "trainer.max_epochs=2", "trainer.precision=32",
            "trainer.platform=cpu", "trainer.log_every_n_steps=1",
            "checkpoint.every_n_steps=1",
            f"checkpoint.dirpath={ckpt_dir}",
            "load_auto_checkpoint=true"]


def test_sigkill_mid_epoch_then_resume(dataset, tmp_path):
    ckpt_dir = str(tmp_path / "ckpts")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    proc = subprocess.Popen(_train_cmd(dataset, ckpt_dir), cwd=REPO, env=env,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    # wait for the first mid-epoch checkpoint (sampler position recorded),
    # then preempt hard
    deadline = time.time() + 300
    last_dir = os.path.join(ckpt_dir, "last")
    while time.time() < deadline:
        if os.path.isdir(last_dir) and os.listdir(last_dir):
            break
        if proc.poll() is not None:
            out = proc.communicate()[0]
            pytest.fail(f"train exited before first checkpoint:\n{out}")
        time.sleep(0.5)
    else:
        proc.kill()
        pytest.fail("no checkpoint appeared within 300s")
    time.sleep(1.0)  # let a save settle (orbax writes are atomic renames)
    proc.send_signal(signal.SIGKILL)
    proc.wait(timeout=60)

    # fresh process: must auto-resume (not restart at step 0) and finish
    out = subprocess.run(_train_cmd(dataset, ckpt_dir), cwd=REPO, env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, timeout=600)
    assert out.returncode == 0, out.stdout
    assert "auto-resumed from step" in out.stdout, out.stdout
    m = [l for l in out.stdout.splitlines() if "auto-resumed from step" in l]
    step = int(m[0].rsplit(" ", 1)[1])
    assert step >= 1  # picked up mid-run progress, not a cold start
    # training completed through the final epoch with a best checkpoint
    assert os.path.isdir(os.path.join(ckpt_dir, "last"))
    assert "epoch 1:" in out.stdout
