"""End-to-end reference .ckpt import: a Lightning-format torch save of the
torch twin must load through dsjax.inference.load_model and give matching
probabilities."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from dsjax.inference import load_model  # noqa: E402
from dsjax.labels import DEFAULT_LABELS  # noqa: E402
from dsjax.model.torch_import import load_torch_state_dict  # noqa: E402

from .torch_twin import TorchTwin  # noqa: E402


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    torch.manual_seed(1)
    twin = TorchTwin(hidden=32, layers=2, bidirectional=True)
    twin.eval()
    state = twin.export_reference_state_dict()
    path = tmp_path_factory.mktemp("ckpt") / "ref_model.ckpt"
    torch.save({
        "state_dict": state,
        "hyper_parameters": {
            "labels": list(DEFAULT_LABELS),
            "precision": 32,
        },
        "epoch": 3,
        "global_step": 123,
    }, str(path))
    return str(path), twin


def test_load_torch_state_dict(ckpt_path):
    path, twin = ckpt_path
    state, hparams = load_torch_state_dict(path)
    assert "conv.seq_module.0.weight" in state
    assert state["rnns.0.rnn.weight_hh_l0"].shape == (128, 32)
    assert hparams.get("labels") == list(DEFAULT_LABELS)


def test_load_model_from_ckpt_matches_torch(ckpt_path):
    path, twin = ckpt_path
    bundle = load_model(path)
    assert bundle.labels == list(DEFAULT_LABELS)
    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 161, 40)).astype(np.float32)
    lengths = np.array([40, 25], np.int32)
    for i, l in enumerate(lengths):
        x[i, :, l:] = 0
    probs, out_lens, _ = bundle.forward(x, lengths)
    with torch.no_grad():
        t_logits, t_lens = twin(torch.from_numpy(x)[:, None],
                                torch.from_numpy(lengths))
    t_probs = torch.softmax(t_logits, -1).numpy()
    np.testing.assert_array_equal(np.asarray(out_lens), t_lens.numpy())
    for i, l in enumerate(np.asarray(out_lens)):
        np.testing.assert_allclose(np.asarray(probs)[i, :l], t_probs[i, :l],
                                   atol=3e-4, rtol=1e-3)


def test_zip_pickle_fallback(ckpt_path):
    """The no-torch reader must parse the same file."""
    path, twin = ckpt_path
    from dsjax.model.torch_import import _load_zip_pickle

    obj = _load_zip_pickle(path)
    state = obj["state_dict"]
    ref = twin.export_reference_state_dict()
    for k, v in ref.items():
        np.testing.assert_allclose(np.asarray(state[k]), v.numpy(), rtol=1e-6,
                                   err_msg=k)
