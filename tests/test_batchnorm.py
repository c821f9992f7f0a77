"""TorchBatchNorm parity: normalization AND running-stat accumulation must
match torch over multiple training steps (biased var for the transform,
unbiased into running stats, momentum 0.1)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dsjax.model.ds2 import TorchBatchNorm  # noqa: E402


def test_running_stats_match_torch_over_steps():
    n_feat = 12
    t_bn = torch.nn.BatchNorm1d(n_feat)
    t_bn.train()
    j_bn = TorchBatchNorm(n_feat, axes=(0,))
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((20, n_feat)).astype(np.float32)
    variables = j_bn.init(jax.random.PRNGKey(0), jnp.asarray(x0), True)
    params = variables["params"]
    stats = variables["batch_stats"]

    for step in range(4):
        x = (rng.standard_normal((20, n_feat)) * (1 + step) + step).astype(np.float32)
        with torch.no_grad():
            t_out = t_bn(torch.from_numpy(x)).numpy()
        j_out, mut = j_bn.apply({"params": params, "batch_stats": stats},
                                jnp.asarray(x), True, mutable=["batch_stats"])
        stats = mut["batch_stats"]
        np.testing.assert_allclose(np.asarray(j_out), t_out, rtol=1e-4, atol=1e-5,
                                   err_msg=f"train output step {step}")

    np.testing.assert_allclose(np.asarray(stats["mean"]),
                               t_bn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(stats["var"]),
                               t_bn.running_var.numpy(), rtol=1e-5, atol=1e-6)

    # eval mode uses the accumulated running stats
    t_bn.eval()
    x = rng.standard_normal((20, n_feat)).astype(np.float32)
    with torch.no_grad():
        t_out = t_bn(torch.from_numpy(x)).numpy()
    j_out = j_bn.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), False)
    np.testing.assert_allclose(np.asarray(j_out), t_out, rtol=1e-4, atol=1e-5)
