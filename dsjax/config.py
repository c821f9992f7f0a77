"""Typed configuration tree with YAML overlays and dotted CLI overrides.

The reference uses Hydra structured configs (dataclass schemas registered in
a ConfigStore, per-dataset ``# @package _global_`` YAML overlays, dotted CLI
overrides — reference: deepspeech_pytorch/configs/train_config.py,
train.py:9-20, configs/an4.yaml). Hydra is not a dependency here; this module
provides the same capability surface with plain dataclasses:

  * a typed config tree (dataclasses, nested);
  * YAML overlay files merged into the tree (``configs=an4`` or a path);
  * dotted overrides with type coercion (``data.batch_size=8``,
    ``optim=sgd`` polymorphic group swaps, ``trainer.max_epochs=70``);
  * round-trip to/from plain dicts for checkpoint embedding.
"""

from __future__ import annotations

import copy
import dataclasses
import enum
import os
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any, Dict, List, Optional, Tuple, Type, Union

import yaml


# ---------------------------------------------------------------------------
# Enums (reference: deepspeech_pytorch/enums.py)
# ---------------------------------------------------------------------------

class DecoderType(str, enum.Enum):
    greedy = "greedy"
    beam = "beam"


class SpectrogramWindow(str, enum.Enum):
    hamming = "hamming"
    hann = "hann"
    blackman = "blackman"
    bartlett = "bartlett"


class RNNType(str, enum.Enum):
    lstm = "lstm"
    gru = "gru"
    rnn = "rnn"


# ---------------------------------------------------------------------------
# Schema (parity with reference configs/train_config.py + TPU-specific knobs)
# ---------------------------------------------------------------------------

@dataclass
class SpectConfig:
    sample_rate: int = 16000          # sample rate of features/model
    window_size: float = 0.02         # STFT window in seconds
    window_stride: float = 0.01       # STFT hop in seconds
    window: SpectrogramWindow = SpectrogramWindow.hamming


@dataclass
class AugmentationConfig:
    speed_volume_perturb: bool = False  # random tempo/gain perturbation
    spec_augment: bool = False          # SpecAugment on spectrograms
    # apply SpecAugment freq/time masks ON DEVICE inside the train step
    # (keeps the device_features fast path; the spline time-warp is
    # host-only and skipped in this mode)
    spec_augment_device: bool = False
    noise_dir: str = ""                 # dir of noise wavs ('' disables)
    noise_prob: float = 0.4             # per-sample probability of noise mix
    noise_min: float = 0.0
    noise_max: float = 0.5


@dataclass
class DataConfig:
    train_path: str = "data/train_manifest.json"
    val_path: str = "data/val_manifest.json"
    batch_size: int = 64
    num_workers: int = 4                # host-side prefetch threads
    labels_path: str = "labels.json"
    spect: SpectConfig = field(default_factory=SpectConfig)
    augmentation: AugmentationConfig = field(default_factory=AugmentationConfig)
    # TPU-first: host only loads/augments waveforms; STFT + normalization run
    # inside the compiled train/eval step (SpecAugment forces host features).
    device_features: bool = True
    # TPU-specific: pad time axis up to multiples of this many STFT frames so
    # XLA sees a bounded set of shapes (bounds recompilation). 64 measured
    # best on a realistic 2-16s corpus: pad efficiency 0.957 vs 0.925 at 128
    # (honest MFU 0.583 vs 0.560) for ~2x the one-time warmup compiles;
    # 32 only adds +1.4% efficiency for another 2x shapes.
    bucket_frames: int = 64
    # split each training batch into this many length-quantile sub-batches
    # per optimizer step (grads summed — one step of identical math apart
    # from per-sub-batch BN statistics, the same trade DDP makes per
    # replica). Collate sorts by length, so each block pads only to its
    # own bucketed max: cuts padding compute when in-batch length spread
    # is wide (unsorted corpora / ragged streams). 1 = off.
    ragged_split: int = 1
    # cap on target length per bucketed batch (chars); 0 = derive from data
    bucket_labels: int = 256
    prefetch_batches: int = 2           # host-side collated-batch prefetch
    # stage put_batch on a background thread so the host->device transfer
    # of batch i+1 overlaps the device step on batch i (single-process
    # runs only: multi-process put_batch does a cross-host collective
    # that must stay on the main thread). 0 = off.
    device_prefetch: int = 2


@dataclass
class BiDirectionalConfig:
    rnn_type: RNNType = RNNType.lstm
    hidden_size: int = 1024
    hidden_layers: int = 5


@dataclass
class UniDirectionalConfig(BiDirectionalConfig):
    lookahead_context: int = 20


@dataclass
class OptimConfig:
    learning_rate: float = 1.5e-4
    learning_anneal: float = 0.99       # per-epoch exponential LR decay
    weight_decay: float = 1e-5


@dataclass
class SGDConfig(OptimConfig):
    momentum: float = 0.9


@dataclass
class AdamConfig(OptimConfig):
    eps: float = 1e-8
    betas: Tuple[float, float] = (0.9, 0.999)


@dataclass
class CheckpointConfig:
    dirpath: Optional[str] = None       # where checkpoints are written
    filename: Optional[str] = None
    monitor: str = "wer"                # metric minimized for best-k
    save_top_k: int = 1
    save_last: bool = True
    verbose: bool = False
    every_n_steps: int = 0              # 0 = only at validation epochs


@dataclass
class TrainerConfig:
    max_epochs: int = 70
    precision: int = 16                 # 16 -> bfloat16 compute on TPU
    gradient_clip_val: float = 400.0
    devices: int = -1                   # -1 = all local devices
    limit_train_batches: float = 1.0    # fraction (<=1.0) or count (>1)
    limit_val_batches: float = 1.0
    log_every_n_steps: int = 50
    # metrics directory: every run writes metrics.jsonl + TensorBoard event
    # files here by default (reference parity: Lightning's default
    # TensorBoardLogger, configs/lightning_config.py:28-30). '' disables.
    log_dir: str = "logs"
    val_check_interval: float = 1.0     # fraction of epoch between val runs
    accumulate_grad_batches: int = 1
    enable_checkpointing: bool = True
    # resume training from an explicit checkpoint path (reference parity:
    # lightning TrainerConf.resume_from_checkpoint, README.md:231-235).
    # Accepts a dsjax checkpoint root (or its last/best subdir) — full
    # training state resumes — or a reference torch .ckpt file, which
    # warm-starts the weights with a fresh optimizer (fine-tuning).
    resume_from_checkpoint: str = ""
    deterministic: bool = False
    # NaN/Inf guard (reference passthrough parity: TrainerConf.detect_anomaly,
    # lightning_config.py:63): enables jax_debug_nans so the first NaN raises
    # with the offending op's trace.
    detect_anomaly: bool = False
    # TPU mesh axes: data-parallel x model-parallel. -1 on data = use all.
    mesh_data: int = -1
    mesh_model: int = 1
    # multi-slice: number of TPU slices (outer DCN-connected mesh axis);
    # batches shard over ('dcn', 'data'), gradients reduce hierarchically
    mesh_dcn: int = 1
    # force a jax platform ('cpu' for CPU smoke/CI runs; '' = default).
    # jax.config wins over the JAX_PLATFORMS env var, which TPU PJRT
    # plugins may override.
    platform: str = ""
    num_cpu_devices: int = 0            # >0: fake this many CPU devices
    # '' = backend default; else 'bfloat16' | 'tensorfloat32' | 'float32'
    matmul_precision: str = ""
    donate_state: bool = True
    # profiling (reference passthrough parity: lightning TrainerConf.profiler)
    profile: bool = False               # capture an XProf trace of a few steps
    profile_dir: str = "profiles"
    profile_start_step: int = 10
    profile_num_steps: int = 4


@dataclass
class TrainConfig:
    data: DataConfig = field(default_factory=DataConfig)
    model: BiDirectionalConfig = field(default_factory=BiDirectionalConfig)
    optim: OptimConfig = field(default_factory=AdamConfig)
    checkpoint: CheckpointConfig = field(default_factory=CheckpointConfig)
    trainer: TrainerConfig = field(default_factory=TrainerConfig)
    seed: int = 123456
    load_auto_checkpoint: bool = False


# Inference-side schemas (reference: configs/inference_config.py)

@dataclass
class LMConfig:
    decoder_type: DecoderType = DecoderType.greedy
    lm_path: str = ""
    top_paths: int = 1
    alpha: float = 0.0
    beta: float = 0.0
    cutoff_top_n: int = 40
    cutoff_prob: float = 1.0
    beam_width: int = 10
    lm_workers: int = 4
    # run beam+LM fully ON DEVICE (HBM-resident n-gram tables, LM fusion
    # inside the beam scan — dsjax.decode.lm_device); needs an ARPA lm_path
    device_beam: bool = False


@dataclass
class ModelLoadConfig:
    precision: int = 32
    model_path: str = ""


@dataclass
class InferenceConfig:
    lm: LMConfig = field(default_factory=LMConfig)
    model: ModelLoadConfig = field(default_factory=ModelLoadConfig)
    # force a jax platform ('cpu' for CPU smoke/CI runs; '' = default).
    # Mirrors TrainerConfig.platform: jax.config wins over the
    # JAX_PLATFORMS env var, which TPU PJRT plugins may override.
    platform: str = ""
    num_cpu_devices: int = 0            # >0: fake this many CPU devices


@dataclass
class TranscribeConfig(InferenceConfig):
    audio_path: str = ""
    offsets: bool = False
    chunk_size_seconds: float = -1.0


@dataclass
class EvalConfig(InferenceConfig):
    test_path: str = ""
    verbose: bool = True
    save_output: str = ""
    batch_size: int = 20
    num_workers: int = 4
    # compute the STFT inside the jitted eval step (int16 raw-audio upload)
    # instead of on host loader threads — the TPU-first default; evaluate()
    # falls back to host features when the spect config can't frame on
    # device (window overlap != 50%)
    device_features: bool = True


@dataclass
class ServerConfig(InferenceConfig):
    host: str = "0.0.0.0"
    port: int = 8888
    chunk_size_seconds: float = -1.0
    max_batch: int = 8                  # server-side dynamic batching cap
    batch_timeout_ms: float = 20.0
    # pre-compile all power-of-2 batch shapes at startup for this utterance
    # length (seconds); 0 disables. Without it the first request at each
    # batch size pays a full XLA compile (tens of seconds on TPU).
    warmup_seconds: float = 10.0
    # /stream sessions idle longer than this are garbage-collected
    stream_session_ttl: float = 300.0


# ---------------------------------------------------------------------------
# Polymorphic group registry ("optim=sgd", "model=unidirectional")
# ---------------------------------------------------------------------------

GROUPS: Dict[str, Dict[str, Type]] = {
    "optim": {"adam": AdamConfig, "sgd": SGDConfig},
    "model": {"bidirectional": BiDirectionalConfig, "unidirectional": UniDirectionalConfig},
}

_CONFIG_DIRS = [
    os.path.join(os.path.dirname(__file__), "configs"),
    "configs",
]


# ---------------------------------------------------------------------------
# dict <-> dataclass plumbing
# ---------------------------------------------------------------------------

def to_dict(cfg: Any) -> Any:
    """Dataclass tree -> plain dict (enums -> their values)."""
    if is_dataclass(cfg) and not isinstance(cfg, type):
        d = {f.name: to_dict(getattr(cfg, f.name)) for f in fields(cfg)}
        d["_type_"] = type(cfg).__name__
        return d
    if isinstance(cfg, enum.Enum):
        return cfg.value
    if isinstance(cfg, (list, tuple)):
        return [to_dict(v) for v in cfg]
    if isinstance(cfg, dict):
        return {k: to_dict(v) for k, v in cfg.items()}
    return cfg


_ALL_SCHEMAS: Dict[str, Type] = {
    cls.__name__: cls
    for cls in (
        SpectConfig, AugmentationConfig, DataConfig, BiDirectionalConfig,
        UniDirectionalConfig, OptimConfig, SGDConfig, AdamConfig,
        CheckpointConfig, TrainerConfig, TrainConfig, LMConfig,
        ModelLoadConfig, InferenceConfig, TranscribeConfig, EvalConfig,
        ServerConfig,
    )
}


def _coerce(value: Any, typ: Any) -> Any:
    """Coerce a YAML/CLI value to the annotated type."""
    origin = getattr(typ, "__origin__", None)
    if origin is Union:
        args = [a for a in typ.__args__ if a is not type(None)]
        if value is None:
            return None
        return _coerce(value, args[0])
    if isinstance(typ, type) and issubclass(typ, enum.Enum):
        return typ(value) if not isinstance(value, typ) else value
    if origin in (tuple, Tuple):
        sub = typ.__args__
        if len(sub) == 2 and sub[1] is Ellipsis:
            return tuple(_coerce(v, sub[0]) for v in value)
        return tuple(_coerce(v, t) for v, t in zip(value, sub))
    if origin in (list, List):
        return [_coerce(v, typ.__args__[0]) for v in value]
    if typ is float and isinstance(value, (int, str)):
        return float(value)
    if typ is int and isinstance(value, (float, str)):
        return int(float(value))
    if typ is bool and isinstance(value, str):
        return value.lower() in ("1", "true", "yes", "on")
    if typ is str and not isinstance(value, str):
        return str(value)
    return value


def from_dict(d: Any, schema: Type) -> Any:
    """Plain dict -> dataclass of type `schema` (honoring _type_ tags)."""
    if d is None:
        return schema() if is_dataclass(schema) else None
    if is_dataclass(schema):
        if isinstance(d, schema):
            return d
        tag = d.get("_type_") if isinstance(d, dict) else None
        if tag and tag in _ALL_SCHEMAS:
            schema = _ALL_SCHEMAS[tag]
        kwargs = {}
        for f in fields(schema):
            if not isinstance(d, dict) or f.name not in d:
                continue
            v = d[f.name]
            if is_dataclass(f.type) or (isinstance(f.type, str) and f.type in _ALL_SCHEMAS):
                sub_schema = f.type if not isinstance(f.type, str) else _ALL_SCHEMAS[f.type]
                kwargs[f.name] = from_dict(v, sub_schema)
            else:
                ftyp = _resolve_type(schema, f)
                if is_dataclass(ftyp):
                    kwargs[f.name] = from_dict(v, ftyp)
                else:
                    kwargs[f.name] = _coerce(v, ftyp)
        return schema(**kwargs)
    return d


def _resolve_type(schema: Type, f: dataclasses.Field) -> Any:
    """Resolve possibly-string field annotations."""
    if not isinstance(f.type, str):
        return f.type
    import typing
    ns = {**vars(typing), **globals()}
    try:
        return eval(f.type, ns)  # noqa: S307 - trusted module-local annotations
    except Exception:
        return Any


# ---------------------------------------------------------------------------
# Overrides + overlays
# ---------------------------------------------------------------------------

def _parse_scalar(s: str) -> Any:
    """Parse a CLI scalar using YAML rules ('8'->int, 'true'->bool, ...)."""
    try:
        return yaml.safe_load(s)
    except yaml.YAMLError:
        return s


def _set_dotted(cfg: Any, dotted: str, raw_value: str) -> None:
    parts = dotted.split(".")
    obj = cfg
    for p in parts[:-1]:
        if not hasattr(obj, p):
            raise KeyError(f"config has no field {dotted!r} (at {p!r})")
        obj = getattr(obj, p)
    name = parts[-1]
    # polymorphic group swap: optim=sgd / model=unidirectional
    if name in GROUPS and isinstance(raw_value, str) and raw_value in GROUPS[name]:
        setattr(obj, name, GROUPS[name][raw_value]())
        return
    if not hasattr(obj, name):
        raise KeyError(f"config has no field {dotted!r}")
    f = next(f for f in fields(obj) if f.name == name)
    typ = _resolve_type(type(obj), f)
    value = _parse_scalar(raw_value) if isinstance(raw_value, str) else raw_value
    if is_dataclass(typ):
        if isinstance(value, dict):
            setattr(obj, name, from_dict(value, typ))
        else:
            raise ValueError(f"{dotted}: expected a mapping for {typ.__name__}")
    else:
        setattr(obj, name, _coerce(value, typ))


def _merge_overlay(cfg: Any, overlay: Dict[str, Any], path: str = "") -> None:
    for k, v in overlay.items():
        if k == "_type_":
            continue
        full = f"{path}.{k}" if path else k
        if not hasattr(cfg, k):
            raise KeyError(f"overlay key {full!r} not in config schema")
        cur = getattr(cfg, k)
        # polymorphic group swap via overlay: {"optim": "sgd"} or typed dict
        if k in GROUPS and isinstance(v, str) and v in GROUPS[k]:
            setattr(cfg, k, GROUPS[k][v]())
            continue
        if is_dataclass(cur) and isinstance(v, dict):
            tag = v.get("_type_")
            if tag and tag in _ALL_SCHEMAS and type(cur).__name__ != tag:
                cur = _ALL_SCHEMAS[tag]()
                setattr(cfg, k, cur)
            _merge_overlay(cur, v, full)
        else:
            f = next(f for f in fields(cfg) if f.name == k)
            setattr(cfg, k, _coerce(v, _resolve_type(type(cfg), f)))


def find_overlay(name: str) -> Optional[str]:
    """Resolve an overlay name ('an4') or path to a YAML file."""
    if os.path.isfile(name):
        return name
    for d in _CONFIG_DIRS:
        p = os.path.join(d, name + ".yaml")
        if os.path.isfile(p):
            return p
    return None


def compose(schema: Type, argv: Optional[List[str]] = None, overlays: Optional[List[str]] = None) -> Any:
    """Build a config: schema defaults -> YAML overlay(s) -> dotted overrides.

    ``argv`` entries: ``key.path=value`` overrides, or ``configs=NAME`` /
    ``+configs=NAME`` to pull in a YAML overlay (reference CLI parity:
    ``python train.py +configs=an4 data.batch_size=8``).
    """
    cfg = schema()
    argv = list(argv or [])
    overlay_names = list(overlays or [])
    rest: List[str] = []
    for a in argv:
        key, _, val = a.partition("=")
        key = key.lstrip("+")
        if key in ("configs", "config"):
            overlay_names.append(val)
        else:
            rest.append(a)
    for name in overlay_names:
        path = find_overlay(name)
        if path is None:
            raise FileNotFoundError(f"config overlay {name!r} not found in {_CONFIG_DIRS}")
        with open(path) as fh:
            overlay = yaml.safe_load(fh) or {}
        overlay.pop("# @package _global_", None)
        _merge_overlay(cfg, overlay)
    for a in rest:
        key, _, val = a.partition("=")
        _set_dotted(cfg, key.lstrip("+"), val)
    return cfg


def print_help(schema: Type, doc: Optional[str] = None) -> None:
    """Print a flat listing of dotted option paths with their defaults
    (used by the root CLIs for -h/--help)."""
    if doc:
        print(doc)
    print("Options (dotted key=value overrides; defaults shown):")

    def walk(d: Dict[str, Any], prefix: str = "") -> None:
        for k, v in d.items():
            if k == "_type_":
                continue
            if isinstance(v, dict) and "_type_" in v:
                walk(v, prefix + k + ".")
            else:
                print(f"  {prefix}{k} = {v!r}")

    walk(to_dict(schema()))


def save_yaml(cfg: Any, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(to_dict(cfg), f, sort_keys=False)


def clone(cfg: Any) -> Any:
    return copy.deepcopy(cfg)
