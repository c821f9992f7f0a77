"""Observability: metrics logger, tfevents writer, step timer, profiler."""

import glob
import json
import os
import struct

import numpy as np

from dsjax.train.logging import (MetricsLogger, StepTimer, TFEventWriter,
                                 _masked_crc, profile_steps)


def test_metrics_logger(tmp_path):
    ml = MetricsLogger(str(tmp_path))
    ml.log(1, loss=3.5, wer=42.0)
    ml.log(2, loss=3.0)
    ml.close()
    lines = [json.loads(l) for l in open(ml.path)]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 3.5
    assert lines[1]["step"] == 2
    assert "time" in lines[0]
    # the same scalars also land in a tfevents file next to the jsonl
    assert glob.glob(str(tmp_path / "events.out.tfevents.*"))


def _read_tfrecords(path):
    """Parse TFRecord framing, verifying both masked CRCs per record."""
    records = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if not header:
                return records
            (length,) = struct.unpack("<Q", header)
            (crc_h,) = struct.unpack("<I", f.read(4))
            assert crc_h == _masked_crc(header), "header crc mismatch"
            data = f.read(length)
            (crc_d,) = struct.unpack("<I", f.read(4))
            assert crc_d == _masked_crc(data), "data crc mismatch"
            records.append(data)


def test_tfevents_framing_and_crc(tmp_path):
    w = TFEventWriter(str(tmp_path))
    w.scalar("loss", 3.25, step=7)
    w.scalar("wer", 55.5, step=8)
    w.close()
    records = _read_tfrecords(w.path)
    # header record (file_version) + 2 scalar events
    assert len(records) == 3
    assert b"brain.Event:2" in records[0]
    assert b"loss" in records[1] and b"wer" in records[2]


def test_tfevents_negative_step(tmp_path):
    """Negative steps must encode as 10-byte two's-complement varints
    (proto int64), not hang the writer (regression: unmasked n >>= 7
    never terminates for n < 0)."""
    from dsjax.train.logging import _varint

    assert _varint(-1) == b"\xff" * 9 + b"\x01"
    w = TFEventWriter(str(tmp_path))
    w.scalar("loss", 1.0, step=-3)   # must return, not spin
    w.close()
    assert len(_read_tfrecords(w.path)) == 2


def test_tfevents_tensorboard_readback(tmp_path):
    """The real TensorBoard parser must read our hand-encoded protos."""
    try:
        from tensorboard.backend.event_processing.event_file_loader import (
            EventFileLoader)
    except Exception:
        import pytest

        pytest.skip("tensorboard not importable")
    w = TFEventWriter(str(tmp_path))
    w.scalar("loss", 3.25, step=7)
    w.scalar("wer", 55.5, step=9)
    w.close()
    got = {}
    for ev in EventFileLoader(w.path).Load():
        for v in getattr(ev, "summary").value:
            # the loader's data-compat pass rewrites simple_value scalars
            # into rank-0 DT_FLOAT tensors
            val = (v.tensor.float_val[0] if v.tensor.float_val
                   else v.simple_value)
            got[(v.tag, ev.step)] = val
    assert got[("loss", 7)] == 3.25
    assert got[("wer", 9)] == 55.5


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
