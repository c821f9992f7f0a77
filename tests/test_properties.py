"""Property-based tests (hypothesis): CTC vs torch over random problem
shapes, WAV roundtrips, sampler invariants, label-map roundtrips."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import jax
import jax.numpy as jnp

from dsjax.data.sampler import BucketBatchSampler, DistributedBucketSampler
from dsjax.labels import DEFAULT_LABELS, LabelMap
from dsjax.model.ctc import ctc_loss

torch = pytest.importorskip("torch")


@settings(max_examples=15, deadline=None)
@given(
    b=st.integers(1, 4),
    t=st.integers(4, 24),
    c=st.integers(2, 8),
    l_max=st.integers(1, 6),
    seed=st.integers(0, 10_000),
)
@pytest.mark.slow
def test_ctc_matches_torch_random_shapes(b, t, c, l_max, seed):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((b, t, c)).astype(np.float32)
    in_lens = rng.integers(1, t + 1, size=b).astype(np.int32)
    tgt_lens = rng.integers(0, l_max + 1, size=b).astype(np.int32)
    targets = rng.integers(1, c, size=(b, l_max)).astype(np.int32)

    t_logits = torch.tensor(logits, requires_grad=True)
    t_lp = torch.log_softmax(t_logits, dim=-1).transpose(0, 1)
    crit = torch.nn.CTCLoss(blank=0, reduction="sum", zero_infinity=True)
    flat = torch.tensor(
        np.concatenate([targets[i, : tgt_lens[i]] for i in range(b)])
        if tgt_lens.sum() else np.zeros((0,), np.int64))
    t_loss = crit(t_lp, flat, torch.tensor(in_lens), torch.tensor(tgt_lens))
    t_loss.backward()

    def jl(x):
        return ctc_loss(jax.nn.log_softmax(x, -1), jnp.asarray(in_lens),
                        jnp.asarray(targets), jnp.asarray(tgt_lens))

    val, grad = jax.value_and_grad(jl)(jnp.asarray(logits))
    np.testing.assert_allclose(float(val), float(t_loss.detach()),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(grad), t_logits.grad.numpy(),
                               rtol=2e-3, atol=2e-4)


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 40),
    batch_size=st.integers(1, 7),
    seed=st.integers(0, 100),
    epoch=st.integers(0, 5),
)
def test_sampler_partitions_dataset(n, batch_size, seed, epoch):
    s = BucketBatchSampler(n, batch_size=batch_size, seed=seed)
    s.set_epoch(epoch)
    batches = list(s)
    flat = sorted(sum((list(b) for b in batches), []))
    assert flat == list(range(n))
    assert all(len(b) <= batch_size for b in batches)


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(4, 50),
    batch_size=st.integers(1, 5),
    reps=st.integers(1, 4),
    epoch=st.integers(0, 3),
)
def test_distributed_sampler_invariants(n, batch_size, reps, epoch):
    per_rank = []
    for rank in range(reps):
        s = DistributedBucketSampler(n, batch_size=batch_size, seed=1,
                                     num_replicas=reps, rank=rank)
        s.set_epoch(epoch)
        per_rank.append(list(s))
    lens = {len(b) for b in per_rank}
    assert len(lens) == 1  # equal batch counts across ranks
    covered = set(sum((list(x) for b in per_rank for x in b), []))
    assert covered == set(range(n))  # padding duplicates allowed, all covered


@settings(max_examples=20, deadline=None)
@given(st.text(alphabet=st.sampled_from(DEFAULT_LABELS + ["x", "5", "!"]),
               max_size=40))
def test_label_map_roundtrip(s):
    lm = LabelMap(DEFAULT_LABELS)
    ids = lm.encode(s)
    kept = "".join(c for c in s if c in lm.char_to_int)
    assert lm.decode(ids) == kept


@settings(max_examples=10, deadline=None)
@given(
    n=st.integers(10, 5000),
    amp=st.floats(0.0, 0.99),
    seed=st.integers(0, 100),
)
def test_wav_roundtrip_property(n, amp, seed, tmp_path_factory):
    from dsjax.audio.io import read_wav, save_wav

    rng = np.random.default_rng(seed)
    y = (rng.uniform(-1, 1, n) * amp).astype(np.float32)
    p = str(tmp_path_factory.mktemp("wav") / "t.wav")
    save_wav(p, y, 16000)
    y2, sr = read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(y2[0], y, atol=1.01 / 32768)
