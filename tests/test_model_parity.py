"""Logit-level parity of the flax DeepSpeech2 against a torch twin with the
reference architecture, via the checkpoint importer."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from dsjax.config import BiDirectionalConfig, RNNType, SpectConfig, UniDirectionalConfig  # noqa: E402
from dsjax.model.ds2 import DeepSpeech2, get_seq_lens, rnn_input_size  # noqa: E402
from dsjax.model.torch_import import convert_state_dict, infer_architecture  # noqa: E402

from .torch_twin import TorchTwin  # noqa: E402


def _run_pair(bidirectional=True, rnn_type=torch.nn.LSTM, cfg_rnn=RNNType.lstm,
              hidden=32, layers=2, eval_mode=True, atol=2e-4):
    torch.manual_seed(0)
    twin = TorchTwin(hidden=hidden, layers=layers, bidirectional=bidirectional,
                     rnn_type=rnn_type)
    twin.eval()
    state = twin.export_reference_state_dict()
    state_np = {k: v.numpy() for k, v in state.items()}

    model_cfg, num_classes = infer_architecture(state_np)
    assert num_classes == 29
    assert model_cfg.hidden_size == hidden
    assert model_cfg.hidden_layers == layers
    assert isinstance(model_cfg, UniDirectionalConfig) == (not bidirectional)
    assert model_cfg.rnn_type == cfg_rnn

    params, stats = convert_state_dict(state_np, layers, bidirectional)
    model = DeepSpeech2(num_classes=29, spect_cfg=SpectConfig(), model_cfg=model_cfg)

    rng = np.random.default_rng(7)
    B, F, T = 3, 161, 50
    x = rng.standard_normal((B, F, T)).astype(np.float32)
    lengths = np.array([50, 37, 22], np.int32)
    # zero-pad past lengths like the collate function does
    for i, l in enumerate(lengths):
        x[i, :, l:] = 0

    with torch.no_grad():
        t_out, t_lens = twin(torch.from_numpy(x)[:, None], torch.from_numpy(lengths))
    j_out, j_lens, _ = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x), jnp.asarray(lengths), train=False)

    np.testing.assert_array_equal(np.asarray(j_lens), t_lens.numpy())
    # our eval output is softmaxed (reference InferenceBatchSoftmax); compare
    # against softmaxed torch logits over valid frames
    t_probs = torch.softmax(t_out, dim=-1).numpy()
    j_np = np.asarray(j_out)
    for i, l in enumerate(np.asarray(j_lens)):
        np.testing.assert_allclose(j_np[i, :l], t_probs[i, :l], atol=atol, rtol=1e-3)
    return j_np, np.asarray(j_lens)


def test_bilstm_parity():
    _run_pair(bidirectional=True)


def test_unilstm_lookahead_parity():
    _run_pair(bidirectional=False)


def test_gru_parity():
    _run_pair(rnn_type=torch.nn.GRU, cfg_rnn=RNNType.gru)


def test_vanilla_rnn_parity():
    _run_pair(rnn_type=torch.nn.RNN, cfg_rnn=RNNType.rnn, atol=1e-3)


def test_seq_lens_formula():
    lens = np.array([1, 2, 50, 99, 100, 1000], np.int32)
    got = np.asarray(get_seq_lens(jnp.asarray(lens)))
    exp = ((lens + 2 * 5 - 10 - 1) // 2 + 1)
    np.testing.assert_array_equal(got, exp)


def test_rnn_input_size():
    assert rnn_input_size(SpectConfig()) == 1312


def test_batch_size_invariance():
    """Masking must make results independent of batch composition
    (the purpose of MaskConv, reference model.py:42-49)."""
    import jax

    cfg = BiDirectionalConfig(hidden_size=16, hidden_layers=2)
    model = DeepSpeech2(num_classes=29, spect_cfg=SpectConfig(), model_cfg=cfg)
    rng = np.random.default_rng(3)
    x_short = rng.standard_normal((1, 161, 30)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_short),
                           jnp.array([30], np.int32), train=False)
    out_solo, lens_solo, _ = model.apply(variables, jnp.asarray(x_short),
                                         jnp.array([30], np.int32), train=False)
    # same sample inside a longer padded batch
    x_batch = np.zeros((2, 161, 80), np.float32)
    x_batch[0, :, :30] = x_short[0]
    x_batch[1] = rng.standard_normal((161, 80)).astype(np.float32)
    out_b, lens_b, _ = model.apply(variables, jnp.asarray(x_batch),
                                   jnp.array([30, 80], np.int32), train=False)
    l = int(np.asarray(lens_solo)[0])
    # different padded shapes change XLA reduction orders -> small f32 noise
    np.testing.assert_allclose(np.asarray(out_b)[0, :l], np.asarray(out_solo)[0, :l],
                               atol=3e-4, rtol=3e-3)


# Conv receptive field half-width on the input time axis: conv2 output
# frame t reads conv1 frames [t-5, t+5]; conv1 frame s reads input
# [2s-5, 2s+5] -> conv2 frame t reads input [2t-15, 2t+15].
_CONV_RF = 16


def _boundary_zeroed_input(T: int, half: int, seed: int = 4) -> np.ndarray:
    """Random (1, 161, T) input, zeroed over [half-RF, half+RF) so a conv
    restart at the chunk boundary sees the SAME values (zero padding) the
    one-shot run sees (explicit zeros) — isolating the RNN-carry invariant
    from conv boundary effects, which the reference accepts identically
    (it restarts conv per chunk, inference.py:86-96)."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((1, 161, T)).astype(np.float32)
    x[:, :, half - _CONV_RF:half + _CONV_RF] = 0
    return x


def _assert_carry_equal(got, want, atol=3e-5):
    import jax

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=atol, rtol=1e-4),
        got, want)


def test_streaming_chunked_equals_one_shot_unidirectional():
    """THE streaming invariant (reference: inference.py:79-99): chunked
    forward with carried hidden state EQUALS the one-shot forward — per-chunk
    outputs concatenate to the full-run outputs, and the carry after the last
    chunk equals the full-run carry at T."""
    import jax

    cfg = UniDirectionalConfig(hidden_size=16, hidden_layers=2, lookahead_context=1)
    model = DeepSpeech2(num_classes=29, spect_cfg=SpectConfig(), model_cfg=cfg)
    T, half = 128, 64
    x = _boundary_zeroed_input(T, half)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.array([T], np.int32), train=False)
    full, full_lens, carry_full = model.apply(
        variables, jnp.asarray(x), jnp.array([T], np.int32), train=False)
    out1, lens1, carry1 = model.apply(variables, jnp.asarray(x[:, :, :half]),
                                      jnp.array([half], np.int32), train=False)
    out2, lens2, carry2 = model.apply(variables, jnp.asarray(x[:, :, half:]),
                                      jnp.array([T - half], np.int32), carry1,
                                      train=False)
    concat = np.concatenate([np.asarray(out1), np.asarray(out2)], axis=1)
    assert concat.shape == np.asarray(full).shape
    # different padded shapes change XLA reduction orders -> small f32 noise
    np.testing.assert_allclose(concat, np.asarray(full), atol=3e-5, rtol=1e-4)
    _assert_carry_equal(carry2, carry_full)
    # and warm != cold: the carry actually flows
    out2_cold, _, _ = model.apply(variables, jnp.asarray(x[:, :, half:]),
                                  jnp.array([T - half], np.int32), train=False)
    assert not np.allclose(np.asarray(out2), np.asarray(out2_cold))


def test_streaming_fwd_carry_bidirectional():
    """For bidirectional models the forward-direction carry must still obey
    the streaming invariant: chunked fwd carry at T == one-shot fwd carry
    (the backward direction restarts per chunk, as the reference does)."""
    import jax

    cfg = BiDirectionalConfig(hidden_size=16, hidden_layers=1)
    model = DeepSpeech2(num_classes=29, spect_cfg=SpectConfig(), model_cfg=cfg)
    T, half = 128, 64
    x = _boundary_zeroed_input(T, half, seed=5)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.array([T], np.int32), train=False)
    _, _, carry_full = model.apply(variables, jnp.asarray(x),
                                   jnp.array([T], np.int32), train=False)
    _, _, carry1 = model.apply(variables, jnp.asarray(x[:, :, :half]),
                               jnp.array([half], np.int32), train=False)
    _, _, carry2 = model.apply(variables, jnp.asarray(x[:, :, half:]),
                               jnp.array([T - half], np.int32), carry1,
                               train=False)
    _assert_carry_equal(carry2[0]["fwd"], carry_full[0]["fwd"])
