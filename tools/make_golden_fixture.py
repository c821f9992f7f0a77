#!/usr/bin/env python
"""Create tests/fixtures/golden_flagship.npz: flagship-width (5x BiLSTM-1024)
golden output probabilities, VALIDATED against the torch twin of the
reference architecture at creation time. The committed fixture then guards
checkpoint-import + forward parity without torch and without network (the
real V3.0 pretrained checkpoints are the online fixture,
reference tests/pretrained_smoke_test.py:10-16)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from dsjax.config import SpectConfig
from dsjax.model.ds2 import DeepSpeech2
from dsjax.model.torch_import import convert_state_dict, infer_architecture
from tests.golden_flagship import (CLASSES, LAYERS, flagship_input,
                                   flagship_state)


def main():
    import jax
    import jax.numpy as jnp
    import torch

    from tests.torch_twin import TorchTwin

    jax.config.update("jax_platforms", "cpu")
    state = flagship_state()
    x, lengths = flagship_input()

    # torch twin forward with the SAME weights (inverse of the twin's
    # export renaming)
    twin = TorchTwin(hidden=1024, layers=LAYERS, bidirectional=True)
    twin.eval()
    exported_keys = twin.export_reference_state_dict().keys()
    assert set(exported_keys) == set(state.keys()), (
        sorted(set(exported_keys) ^ set(state.keys()))[:10])
    # map twin's own param names -> exported names by re-running the export
    # on a tagged copy
    own_sd = twin.state_dict()
    name_map = {}
    for own_key in own_sd:
        if "num_batches_tracked" in own_key:
            continue
        probe = {k: torch.zeros(1) for k in own_sd}
        # replicate export_reference_state_dict's rename for one key
        ren = {
            "conv1.": "conv.seq_module.0.", "bn1.": "conv.seq_module.1.",
            "conv2.": "conv.seq_module.3.", "bn2.": "conv.seq_module.4.",
            "fc_bn.": "fc.0.module.0.", "fc.": "fc.0.module.1.",
            "lookahead.": "lookahead.0.conv.",
        }
        k = own_key
        if k.startswith("rnns."):
            i = k.split(".")[1]
            name_map[own_key] = f"rnns.{i}.rnn." + k.split(".", 2)[2]
        elif k.startswith("rnn_bns."):
            i = k.split(".")[1]
            name_map[own_key] = f"rnns.{i}.batch_norm." + k.split(".", 2)[2]
        else:
            for old, new in ren.items():
                if k.startswith(old):
                    name_map[own_key] = new + k[len(old):]
                    break
            else:
                name_map[own_key] = k
        del probe
    with torch.no_grad():
        for own_key, exp_key in name_map.items():
            own_sd[own_key].copy_(torch.from_numpy(state[exp_key]))
        t_out, t_lens = twin(torch.from_numpy(x)[:, None],
                             torch.from_numpy(lengths))
        t_probs = torch.softmax(t_out, dim=-1).numpy()

    # dsjax forward through the importer
    model_cfg, num_classes = infer_architecture(state)
    assert num_classes == CLASSES and model_cfg.hidden_size == 1024
    params, stats = convert_state_dict(state, LAYERS, True)
    model = DeepSpeech2(num_classes=CLASSES, spect_cfg=SpectConfig(),
                        model_cfg=model_cfg)
    j_out, j_lens, _ = model.apply({"params": params, "batch_stats": stats},
                                   jnp.asarray(x), jnp.asarray(lengths),
                                   train=False)
    j_probs, j_lens = np.asarray(j_out), np.asarray(j_lens)
    np.testing.assert_array_equal(j_lens, t_lens.numpy())
    for i, l in enumerate(j_lens):
        np.testing.assert_allclose(j_probs[i, :l], t_probs[i, :l],
                                   atol=2e-4, rtol=1e-3)
    print("torch twin parity at flagship width: OK "
          f"(max abs diff {np.max(np.abs(j_probs - t_probs)):.2e})")

    out = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                       "golden_flagship.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, probs=j_probs.astype(np.float32),
                        out_lens=j_lens.astype(np.int32))
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
