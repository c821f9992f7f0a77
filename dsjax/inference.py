"""Inference workflows: model loading, chunked streaming transcription.

Reference parity (deepspeech_pytorch/inference.py, utils.py:29-54): load a
checkpoint (ours or a reference .ckpt via the torch importer), build a
greedy/beam decoder from LMConfig, then transcribe chunk-by-chunk carrying
the RNN hidden state across chunks so arbitrarily long audio streams through
fixed device memory (inference.py:79-99).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dsjax.audio.features import FeatureExtractor
from dsjax.audio.io import load_audio
from dsjax.config import (DecoderType, LMConfig, SpectConfig, TrainConfig,
                          from_dict)
from dsjax.decode.beam import BeamCTCDecoder
from dsjax.decode.greedy import GreedyDecoder
from dsjax.labels import DEFAULT_LABELS
from dsjax.model.ds2 import DeepSpeech2


@dataclasses.dataclass
class ModelBundle:
    model: DeepSpeech2
    variables: Dict[str, Any]
    labels: List[str]
    spect_cfg: SpectConfig
    # shard eval batches over all local devices (a v5e-8 pod VM evaluates
    # on 8 chips instead of 1); B=1 streaming/transcribe paths are
    # untouched — the sharded jits only engage when the batch divides the
    # device count. The reference evaluates on a single GPU (testing.py).
    data_parallel: bool = True

    def __post_init__(self):
        # variables ride as jit ARGUMENTS (closures would bake weights into
        # the compiled program as constants)
        self._apply = jax.jit(
            lambda v, x, lens: self.model.apply(v, x, lens, train=False))
        self._apply_carry = jax.jit(
            lambda v, x, lens, carry: self.model.apply(v, x, lens, carry,
                                                       train=False))

        def _audio_apply(v, y, lens):
            from dsjax.audio.features import spectrogram_jax

            feats = spectrogram_jax(y, lens, self.spect_cfg, normalize=True)
            return self.model.apply(v, feats, lens, train=False)

        self._apply_audio = jax.jit(_audio_apply)

        self.mesh = None
        self.batch_sharding = None
        devs = jax.devices()
        if self.data_parallel and len(devs) > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec

            self.mesh = Mesh(np.array(devs), ("data",))
            self.batch_sharding = NamedSharding(self.mesh,
                                                PartitionSpec("data"))
            rep = NamedSharding(self.mesh, PartitionSpec())
            bs = self.batch_sharding
            # place the weights replicated ONCE: an operand that is not
            # already committed to the jit's sharding is re-transferred on
            # EVERY call (measured ~7x per-call overhead for weight-sized
            # operands), which would eat the multi-chip speedup
            self._vars_dp = jax.device_put(self.variables, rep)
            self._apply_dp = jax.jit(
                lambda v, x, lens: self.model.apply(v, x, lens, train=False),
                in_shardings=(rep, bs, bs))
            self._apply_audio_dp = jax.jit(_audio_apply,
                                           in_shardings=(rep, bs, bs))

    def _dp(self, batch: int) -> bool:
        return (self.mesh is not None
                and batch % self.mesh.devices.size == 0)

    def forward(self, spect: np.ndarray, lengths: np.ndarray, carry=None):
        """(B, F, T) features — or (B, L_pad) raw audio prepared by
        pad_audio_for_device, with the STFT fused into the jitted step —
        -> (probs (B, T', C), out_lens, carry). Posteriors come back
        sharded over the data mesh when the batch divides the local
        device count; device decoders consume them in place."""
        dp = carry is None and self._dp(spect.shape[0])
        if dp:
            # hand inputs to the sharded jit as-is: in_shardings places
            # host arrays across the mesh, and arrays the caller already
            # staged with the batch sharding pass through untouched
            # (jnp/np conversion would force a sync + reshard)
            x = spect
            lens = (lengths if isinstance(lengths, jax.Array)
                    else np.asarray(lengths, np.int32))
            return (self._apply_audio_dp if spect.ndim == 2
                    else self._apply_dp)(self._vars_dp, x, lens)
        x = jnp.asarray(spect)
        lens = jnp.asarray(lengths, jnp.int32)
        if spect.ndim == 2:
            return self._apply_audio(self.variables, x, lens)
        if carry is None:
            return self._apply(self.variables, x, lens)
        return self._apply_carry(self.variables, x, lens, carry)


def load_model(model_path: str, precision: int = 32) -> ModelBundle:
    """Load a dsjax checkpoint dir or a reference torch .ckpt file."""
    dtype = jnp.bfloat16 if precision == 16 else jnp.float32
    if os.path.isfile(model_path) and model_path.endswith(".ckpt"):
        from dsjax.model.torch_import import import_checkpoint

        imported = import_checkpoint(model_path)
        labels = imported["labels"] or list(DEFAULT_LABELS)
        model = DeepSpeech2(num_classes=imported["num_classes"],
                            spect_cfg=imported["spect_cfg"],
                            model_cfg=imported["model_cfg"], dtype=dtype)
        variables = {"params": imported["params"],
                     "batch_stats": imported["batch_stats"]}
        return ModelBundle(model, variables, labels, imported["spect_cfg"])

    # dsjax checkpoint directory
    from dsjax.train.checkpoint import CheckpointHandler, load_meta
    from dsjax.train.loop import Trainer

    meta = load_meta(model_path)
    cfg = from_dict(meta["config"], TrainConfig)
    labels = meta.get("labels") or list(DEFAULT_LABELS)
    trainer = Trainer(cfg, labels)
    state = trainer.init_state()
    handler = CheckpointHandler(model_path, cfg=cfg, labels=labels)
    try:
        state = handler.restore(state, best=True)
    except FileNotFoundError as e:  # no best checkpoint -> fall back to last
        try:
            state = handler.restore(state, best=False)
        except FileNotFoundError:
            raise FileNotFoundError(
                f"no restorable checkpoint in {model_path}") from e
    model = DeepSpeech2(num_classes=len(labels), spect_cfg=cfg.data.spect,
                        model_cfg=cfg.model, dtype=dtype)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return ModelBundle(model, variables, labels, cfg.data.spect)


def load_decoder(labels: List[str], cfg: LMConfig, want_offsets: bool = False):
    """Greedy or beam decoder from config (reference: utils.py:37-54).

    LM-free beam decode runs ON DEVICE (DeviceBeamDecoder: one batched jit
    scan instead of a host loop per utterance); with an LM the host
    C++/Python beam with shallow fusion is used, unless ``lm.device_beam``
    moves the LM itself onto the device (HBM hash tables fused into the
    beam scan — requires an ARPA-format lm_path).

    ``want_offsets``: the caller will surface per-char offsets (transcribe
    offsets=true) — device beams then reconstruct ctcdecode-parity
    timesteps (costs one posterior download per decode); WER-only paths
    keep the zero-transfer emission offsets."""
    if cfg.decoder_type == DecoderType.beam:
        if not cfg.lm_path:
            from dsjax.decode.beam_device import DeviceBeamDecoder

            return DeviceBeamDecoder(labels, beam_width=cfg.beam_width,
                                     cutoff_top_n=cfg.cutoff_top_n,
                                     cutoff_prob=cfg.cutoff_prob,
                                     ctc_offsets=want_offsets)
        if getattr(cfg, "device_beam", False):
            from dsjax.decode.lm import BINARY_MAGIC

            with open(cfg.lm_path, "rb") as f:
                is_v1_binary = f.read(8) == BINARY_MAGIC
            if is_v1_binary:
                # v1 binaries carry only one-way hashes — the device tables
                # cannot be rebuilt from them. Be loud about the fallback
                # (the README recommends binary LMs, so silence here would
                # quietly disable the flagship path).
                import warnings

                warnings.warn(
                    "lm.device_beam=true but the LM is a DSLMBIN1 binary: "
                    "falling back to the host C++ beam. Rebuild the binary "
                    "with tools/build_lm_binary.py (writes DSLMBIN2, which "
                    "the device beam can load) or pass the ARPA file.")
            else:  # ARPA text or DSLMBIN2 — both build device tables
                from dsjax.decode.beam_device import DeviceBeamDecoder

                return DeviceBeamDecoder(labels, beam_width=cfg.beam_width,
                                         lm_path=cfg.lm_path,
                                         alpha=cfg.alpha, beta=cfg.beta,
                                         cutoff_top_n=cfg.cutoff_top_n,
                                         cutoff_prob=cfg.cutoff_prob,
                                         ctc_offsets=want_offsets)
        return BeamCTCDecoder(labels, lm_path=cfg.lm_path,
                              alpha=cfg.alpha, beta=cfg.beta,
                              cutoff_top_n=cfg.cutoff_top_n,
                              cutoff_prob=cfg.cutoff_prob,
                              beam_width=cfg.beam_width,
                              num_processes=cfg.lm_workers)
    return GreedyDecoder(labels)


def run_transcribe(audio_path: str, bundle: ModelBundle, decoder,
                   chunk_size_seconds: float = -1.0,
                   normalize: bool = True, n_best: Optional[int] = None
                   ) -> Tuple[List[List[str]], List[List[np.ndarray]]]:
    """Chunked transcription with RNN state carry (reference:
    inference.py:79-99). chunk_size_seconds <= 0 transcribes in one shot.
    n_best caps the hypotheses materialized per utterance (None = all)."""
    extractor = FeatureExtractor(bundle.spect_cfg, normalize=normalize)
    y = load_audio(audio_path, bundle.spect_cfg.sample_rate)
    carry = None
    outs = []
    for y_chunk in extractor.chunks(y, chunk_size_seconds):
        if len(y_chunk) == 0:
            continue
        spect = extractor(y_chunk)[None]  # (1, F, T)
        lens = np.array([spect.shape[2]], np.int32)
        probs, out_lens, carry = bundle.forward(spect, lens, carry)
        outs.append(np.asarray(probs))
    if not outs:
        return [[""]], [[np.zeros((0,), np.int32)]]
    all_out = np.concatenate(outs, axis=1)
    return decoder.decode(all_out, n_best=n_best)


def decode_results(decoded_output: List[List[str]],
                   decoded_offsets: List[List[np.ndarray]],
                   model_path: str = "", lm_cfg: Optional[LMConfig] = None,
                   offsets: bool = False, top_paths: int = 1) -> Dict[str, Any]:
    """Result JSON shape parity (reference: inference.py:16-41)."""
    lm_cfg = lm_cfg or LMConfig()
    results: Dict[str, Any] = {
        "output": [],
        "_meta": {
            "acoustic_model": {"path": model_path},
            "language_model": {"path": lm_cfg.lm_path},
            "decoder": {
                "alpha": lm_cfg.alpha,
                "beta": lm_cfg.beta,
                "type": lm_cfg.decoder_type.value,
            },
        },
    }
    for b in range(len(decoded_output)):
        for pi in range(min(top_paths, len(decoded_output[b]))):
            result = {"transcription": decoded_output[b][pi]}
            if offsets:
                result["offsets"] = np.asarray(decoded_offsets[b][pi]).tolist()
            results["output"].append(result)
    return results
