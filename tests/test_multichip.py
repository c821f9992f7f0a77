"""Multi-chip sharding tests on the faked 8-device CPU mesh: full train step
under dp-only and dp x tp meshes, gradient equivalence across layouts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dsjax.config import TrainConfig, compose
from dsjax.data.dataset import Batch
from dsjax.labels import DEFAULT_LABELS
from dsjax.parallel.mesh import make_mesh
from dsjax.train.loop import Trainer


def _tiny_batch(rng, b, t=64, l=8):
    inputs = rng.standard_normal((b, 161, t)).astype(np.float32)
    input_lengths = np.full((b,), t, np.int32)
    input_lengths[1::2] = t // 2
    targets = rng.integers(1, len(DEFAULT_LABELS), size=(b, l)).astype(np.int32)
    target_lengths = np.full((b,), l, np.int32)
    return Batch(inputs, input_lengths, targets, target_lengths,
                 input_lengths.astype(np.float32) / t)


def _cfg(batch):
    return compose(TrainConfig, [
        "model.hidden_size=64", "model.hidden_layers=2",
        "trainer.precision=32", f"data.batch_size={batch}",
    ])


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2)])
@pytest.mark.slow
def test_train_step_on_mesh(dp, tp):
    if len(jax.devices()) < dp * tp:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(dp, tp, devices=jax.devices()[: dp * tp])
    trainer = Trainer(_cfg(dp * 2), DEFAULT_LABELS, mesh=mesh)
    state = trainer.init_state()
    batch = _tiny_batch(np.random.default_rng(0), dp * 2)
    state, loss = trainer.train_step(state, batch)
    assert np.isfinite(float(loss))
    state, loss2 = trainer.train_step(state, batch)
    assert np.isfinite(float(loss2))
    assert float(loss2) < float(loss)  # optimizing on the same batch


def test_dp_matches_single_device_loss():
    """The dp-sharded loss must equal the single-device loss of the same
    global batch (GSPMD correctness sanity)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    rng = np.random.default_rng(1)
    batch = _tiny_batch(rng, 8)
    cfg = _cfg(8)

    t_multi = Trainer(cfg, DEFAULT_LABELS,
                      mesh=make_mesh(8, 1, devices=jax.devices()))
    t_single = Trainer(cfg, DEFAULT_LABELS,
                       mesh=make_mesh(1, 1, devices=jax.devices()[:1]))
    rng_key = jax.random.PRNGKey(0)
    s_multi = t_multi.shard_state(t_multi.init_state(rng_key))
    s_single = t_single.shard_state(t_single.init_state(rng_key))
    # same initial params by construction (same seed)
    _, loss_m = t_multi.train_step(s_multi, batch)
    _, loss_s = t_single.train_step(s_single, batch)
    # multi divides by dp=8, single by 1: rescale
    np.testing.assert_allclose(float(loss_m) * 8, float(loss_s), rtol=1e-4)


@pytest.mark.parametrize("dcn,dp,tp", [(2, 4, 1), (2, 2, 2)])
@pytest.mark.slow
def test_dcn_mesh_matches_flat_dp(dcn, dp, tp):
    """Multi-slice ('dcn','data','model') mesh computes the same loss as
    the flat single-slice mesh for the same global batch (the dcn axis is
    outermost so the inter-slice reduce rides DCN on real hardware)."""
    if len(jax.devices()) < dcn * dp * tp:
        pytest.skip("needs 8 devices")
    rng_key = jax.random.PRNGKey(3)
    batch = _tiny_batch(np.random.default_rng(5), 8)
    cfg = _cfg(8)

    t_dcn = Trainer(cfg, DEFAULT_LABELS,
                    mesh=make_mesh(dp, tp, devices=jax.devices()[:8], dcn=dcn))
    t_flat = Trainer(cfg, DEFAULT_LABELS,
                     mesh=make_mesh(dcn * dp, tp, devices=jax.devices()[:8]))
    assert t_dcn.dp == dcn * dp
    s_dcn = t_dcn.shard_state(t_dcn.init_state(rng_key))
    s_flat = t_flat.shard_state(t_flat.init_state(rng_key))
    _, loss_d = t_dcn.train_step(s_dcn, batch)
    _, loss_f = t_flat.train_step(s_flat, batch)
    np.testing.assert_allclose(float(loss_d), float(loss_f), rtol=1e-4)


def test_data_parallel_inference_matches_single_device():
    """ModelBundle shards eval batches over all local devices; outputs
    must match the single-device forward exactly, and the device greedy
    decoder must consume the sharded posteriors in place."""
    from dsjax.config import SpectConfig
    from dsjax.decode.greedy import GreedyDecoder
    from dsjax.inference import ModelBundle
    from dsjax.model.ds2 import DeepSpeech2

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    rng = np.random.default_rng(5)
    model = DeepSpeech2(num_classes=len(DEFAULT_LABELS),
                        spect_cfg=SpectConfig(),
                        model_cfg=_cfg(8).model, dtype=jnp.float32)
    x = rng.standard_normal((8, 161, 64)).astype(np.float32)
    lens = np.full((8,), 64, np.int32)
    lens[1::2] = 32
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]),
                           jnp.asarray(lens[:1]), train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    dp_bundle = ModelBundle(model, variables, list(DEFAULT_LABELS),
                            SpectConfig())
    sd_bundle = ModelBundle(model, variables, list(DEFAULT_LABELS),
                            SpectConfig(), data_parallel=False)
    assert dp_bundle.mesh is not None and sd_bundle.mesh is None

    p_dp, l_dp, _ = dp_bundle.forward(x, lens)
    p_sd, l_sd, _ = sd_bundle.forward(x, lens)
    assert len(p_dp.sharding.device_set) == len(jax.devices())
    np.testing.assert_array_equal(np.asarray(l_dp), np.asarray(l_sd))
    np.testing.assert_allclose(np.asarray(p_dp), np.asarray(p_sd),
                               rtol=1e-6, atol=1e-6)

    dec = GreedyDecoder(DEFAULT_LABELS)
    d_dp, _ = dec.decode(p_dp, l_dp)
    d_sd, _ = dec.decode(p_sd, l_sd)
    assert d_dp == d_sd

    # an indivisible batch falls back to the single-device jit
    p7, l7, _ = dp_bundle.forward(x[:7], lens[:7])
    np.testing.assert_allclose(np.asarray(p7), np.asarray(p_sd)[:7],
                               rtol=1e-6, atol=1e-6)


def test_device_beam_lm_on_sharded_posteriors():
    """DeviceBeamDecoder consumes data-parallel-sharded posteriors: the LM
    tables replicate lazily across the posterior's device set and results
    equal the single-device decode exactly."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from dsjax.decode.beam_device import DeviceBeamDecoder

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    arpa = """\\data\\
ngram 1=5
ngram 2=2

\\1-grams:
-1.0\t<s>\t-0.5
-1.2\t</s>
-0.8\tAB\t-0.3
-1.1\tA\t-0.4
-2.0\t<unk>

\\2-grams:
-0.2\tAB A
-0.4\tA AB

\\end\\
"""
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".arpa", delete=False) as f:
        f.write(arpa)
        arpa_path = f.name
    labels = ["_", "'", "A", "B", "C", " "]
    rng = np.random.default_rng(9)
    logits = rng.standard_normal((8, 40, len(labels))).astype(np.float32)
    logits[..., 5] += 1.0
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), -1))

    dec = DeviceBeamDecoder(labels, beam_width=8, lm_path=arpa_path,
                            alpha=0.6, beta=0.4)
    want, _ = dec.decode(probs, n_best=1)

    mesh = Mesh(np.array(jax.devices()), ("data",))
    sharded = jax.device_put(probs, NamedSharding(mesh,
                                                  PartitionSpec("data")))
    got, _ = dec.decode(sharded, n_best=1)
    assert got == want
    assert dec._lm_rep is not None                 # lazy replication ran
    assert len(dec._lm_rep.ngrams.sharding.device_set) == len(jax.devices())
