"""Import reference PyTorch checkpoints into dsjax parameter trees.

The reference ships V3.0 pretrained Lightning checkpoints (an4, librispeech,
tedlium — reference: tests/pretrained_smoke_test.py:10-14) whose state_dict
keys follow deepspeech_pytorch/model.py's module tree. This converter maps
them onto our flax tree so those checkpoints serve as logit-parity fixtures
and production models.

Key layout conversions:
  * Conv2d weight (O, I, kH, kW)  -> HWIO (kH, kW, I, O)
  * RNN weight_ih (G*H, D)        -> (D, G*H)   (gate order preserved:
    LSTM i,f,g,o / GRU r,z,n — cuDNN/torch order)
  * Linear weight (O, I)          -> (I, O)
  * BatchNorm running stats       -> batch_stats collection

torch is only needed at import time (CPU); the rest of the framework never
touches it.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from dsjax.config import BiDirectionalConfig, RNNType, SpectConfig, UniDirectionalConfig


# ---------------------------------------------------------------------------
# Tolerant checkpoint reading (no omegaconf/lightning required)
# ---------------------------------------------------------------------------

class _Stub:
    """Placeholder for unpicklable classes inside hyper_parameters."""

    def __init__(self, *a, **k):
        self.__dict__.update(k)

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)

    def __repr__(self):
        return f"_Stub({self.__dict__})"


def load_torch_state_dict(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    """Load a torch/Lightning .ckpt -> (numpy state_dict, hparams best-effort).

    Prefers torch.load when torch is importable; otherwise falls back to a
    direct zip+pickle reader for the standard zipfile serialization format.
    Unknown classes (omegaconf configs, Lightning internals) are stubbed so
    a missing dependency never blocks weight import.
    """
    try:
        import torch

        class _TolerantUnpickler(pickle.Unpickler):
            def find_class(self, module, name):
                try:
                    return super().find_class(module, name)
                except (ImportError, AttributeError):
                    return type(name, (_Stub,), {})

        class _Pickle:
            Unpickler = _TolerantUnpickler
            # torch.load calls pickle_module.load/loads in some paths
            @staticmethod
            def load(f, **kw):
                return _TolerantUnpickler(f).load()

        obj = torch.load(path, map_location="cpu", pickle_module=_Pickle,
                         weights_only=False)
    except ImportError:
        obj = _load_zip_pickle(path)

    state = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    hparams = {}
    if isinstance(obj, dict):
        hparams = obj.get("hyper_parameters", obj.get("hparams", {})) or {}
    np_state = {}
    for k, v in state.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        np_state[k] = np.asarray(v)
    return np_state, _plainify(hparams)


def _plainify(x: Any) -> Any:
    if isinstance(x, dict):
        return {k: _plainify(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_plainify(v) for v in x]
    if isinstance(x, _Stub) or (hasattr(x, "__dict__") and not isinstance(x, (int, float, str, bool))):
        try:
            return {k: _plainify(v) for k, v in vars(x).items()}
        except TypeError:
            return repr(x)
    return x


def _load_zip_pickle(path: str) -> Dict[str, Any]:
    """Minimal reader for torch's zipfile format without torch installed."""
    zf = zipfile.ZipFile(path)
    pkl_name = next(n for n in zf.namelist() if n.endswith("data.pkl"))
    prefix = pkl_name[: -len("data.pkl")]

    loaded_storages: Dict[str, np.ndarray] = {}

    dtype_map = {
        "FloatStorage": np.float32, "DoubleStorage": np.float64,
        "HalfStorage": np.float16, "LongStorage": np.int64,
        "IntStorage": np.int32, "ShortStorage": np.int16,
        "CharStorage": np.int8, "ByteStorage": np.uint8,
        "BoolStorage": np.bool_, "BFloat16Storage": np.uint16,
    }

    class _FakeTensor:
        def __init__(self, storage, storage_offset, size, stride):
            self.storage, self.offset, self.size, self.stride = storage, storage_offset, size, stride

        def to_numpy(self):
            arr = self.storage
            n = int(np.prod(self.size)) if self.size else 1
            flat = arr[self.offset: self.offset + max(n, 1)]
            try:
                return np.lib.stride_tricks.as_strided(
                    arr[self.offset:],
                    shape=tuple(self.size),
                    strides=tuple(s * arr.itemsize for s in self.stride),
                ).copy()
            except Exception:
                return flat.reshape(self.size).copy()

    def persistent_load(saved_id):
        typename, storage_type, key, _location, numel = saved_id[:5]
        assert typename == "storage"
        if key not in loaded_storages:
            name = getattr(storage_type, "__name__", str(storage_type))
            np_dtype = None
            for torch_name, dt in dtype_map.items():
                if torch_name in name:
                    np_dtype = dt
                    break
            if np_dtype is None:
                np_dtype = np.float32
            data = zf.read(f"{prefix}data/{key}")
            loaded_storages[key] = np.frombuffer(data, dtype=np_dtype).copy()
        return loaded_storages[key]

    def rebuild_tensor(storage, storage_offset, size, stride, *args):
        return _FakeTensor(storage, storage_offset, size, stride)

    class _U(pickle.Unpickler):
        def find_class(self, module, name):
            if name in ("_rebuild_tensor_v2", "_rebuild_tensor"):
                return rebuild_tensor
            if module.startswith("torch") and "Storage" in name:
                return type(name, (), {"__name__": name})
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                return type(name, (_Stub,), {})

        def persistent_load(self, pid):
            return persistent_load(pid)

    obj = _U(io.BytesIO(zf.read(pkl_name))).load()

    def materialize(x):
        if isinstance(x, _FakeTensor):
            return x.to_numpy()
        if isinstance(x, dict):
            return {k: materialize(v) for k, v in x.items()}
        if isinstance(x, list):
            return [materialize(v) for v in x]
        return x

    return materialize(obj)


# ---------------------------------------------------------------------------
# Architecture inference + parameter mapping
# ---------------------------------------------------------------------------

def infer_architecture(state: Dict[str, np.ndarray]) -> Tuple[BiDirectionalConfig, int]:
    """Infer (model_cfg, num_classes) from reference state_dict shapes."""
    n_layers = 1 + max(
        (int(k.split(".")[1]) for k in state if k.startswith("rnns.")), default=0
    )
    bidirectional = any("_reverse" in k for k in state)
    w_hh = state["rnns.0.rnn.weight_hh_l0"]
    hidden = w_hh.shape[1]
    gates = w_hh.shape[0] // hidden
    rnn_type = {4: RNNType.lstm, 3: RNNType.gru, 1: RNNType.rnn}[gates]
    fc_key = next(k for k in state if k.startswith("fc.") and k.endswith(".weight")
                  and state[k].ndim == 2)
    num_classes = state[fc_key].shape[0]
    if bidirectional:
        cfg = BiDirectionalConfig(rnn_type=rnn_type, hidden_size=hidden,
                                  hidden_layers=n_layers)
    else:
        ctx = state["lookahead.0.conv.weight"].shape[2] if "lookahead.0.conv.weight" in state else 20
        cfg = UniDirectionalConfig(rnn_type=rnn_type, hidden_size=hidden,
                                   hidden_layers=n_layers, lookahead_context=ctx)
    return cfg, num_classes


def convert_state_dict(state: Dict[str, np.ndarray], n_layers: int,
                       bidirectional: bool) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference state_dict -> (params, batch_stats) flax trees."""
    f32 = lambda a: np.ascontiguousarray(a, dtype=np.float32)

    def conv_w(key):  # (O, I, kH, kW) -> (kH, kW, I, O)
        return f32(state[key].transpose(2, 3, 1, 0))

    def bn(prefix):
        return (
            {"scale": f32(state[f"{prefix}.weight"]), "bias": f32(state[f"{prefix}.bias"])},
            {"mean": f32(state[f"{prefix}.running_mean"]), "var": f32(state[f"{prefix}.running_var"])},
        )

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    bn1_p, bn1_s = bn("conv.seq_module.1")
    bn2_p, bn2_s = bn("conv.seq_module.4")
    params["conv"] = {
        "conv1": {"kernel": conv_w("conv.seq_module.0.weight"),
                  "bias": f32(state["conv.seq_module.0.bias"])},
        "bn1": bn1_p,
        "conv2": {"kernel": conv_w("conv.seq_module.3.weight"),
                  "bias": f32(state["conv.seq_module.3.bias"])},
        "bn2": bn2_p,
    }
    stats["conv"] = {"bn1": bn1_s, "bn2": bn2_s}

    for i in range(n_layers):
        layer: Dict[str, np.ndarray] = {}
        base = f"rnns.{i}.rnn"
        layer["fwd_w_ih"] = f32(state[f"{base}.weight_ih_l0"].T)
        layer["fwd_w_hh"] = f32(state[f"{base}.weight_hh_l0"].T)
        layer["fwd_b_ih"] = f32(state[f"{base}.bias_ih_l0"])
        layer["fwd_b_hh"] = f32(state[f"{base}.bias_hh_l0"])
        if bidirectional:
            layer["bwd_w_ih"] = f32(state[f"{base}.weight_ih_l0_reverse"].T)
            layer["bwd_w_hh"] = f32(state[f"{base}.weight_hh_l0_reverse"].T)
            layer["bwd_b_ih"] = f32(state[f"{base}.bias_ih_l0_reverse"])
            layer["bwd_b_hh"] = f32(state[f"{base}.bias_hh_l0_reverse"])
        params[f"rnn{i}"] = layer
        if i > 0:
            p, s = bn(f"rnns.{i}.batch_norm.module")
            params[f"rnn{i}_bn"] = p
            stats[f"rnn{i}_bn"] = s

    if any(k.startswith("lookahead.") for k in state):
        # torch Conv1d weight (F, 1, context) -> ours (F, context)
        params["lookahead"] = {"weight": f32(state["lookahead.0.conv.weight"][:, 0, :])}

    fc_bn_p, fc_bn_s = bn("fc.0.module.0")
    params["fc_bn"] = fc_bn_p
    stats["fc_bn"] = fc_bn_s
    params["fc"] = {"kernel": f32(state["fc.0.module.1.weight"].T)}
    return params, stats


def import_checkpoint(path: str) -> Dict[str, Any]:
    """Full import: reference .ckpt -> dict with model config, labels (if
    recoverable), params and batch_stats ready for DeepSpeech2.apply."""
    state, hparams = load_torch_state_dict(path)
    model_cfg, num_classes = infer_architecture(state)
    params, stats = convert_state_dict(
        state, model_cfg.hidden_layers,
        not isinstance(model_cfg, UniDirectionalConfig))

    labels: Optional[List[str]] = None
    if isinstance(hparams, dict):
        raw = hparams.get("labels")
        if isinstance(raw, (list, tuple)) and all(isinstance(c, str) for c in raw):
            labels = list(raw)
    spect = SpectConfig()
    sp = hparams.get("spect_cfg") if isinstance(hparams, dict) else None
    if isinstance(sp, dict):
        content = sp.get("_content", sp)
        if isinstance(content, dict):
            spect = SpectConfig(
                sample_rate=int(content.get("sample_rate", 16000)),
                window_size=float(content.get("window_size", 0.02)),
                window_stride=float(content.get("window_stride", 0.01)),
            )
    return {
        "model_cfg": model_cfg,
        "num_classes": num_classes,
        "labels": labels,
        "spect_cfg": spect,
        "params": params,
        "batch_stats": stats,
    }
