#!/usr/bin/env python
"""LM hyperparameter search over (alpha, beta) for the beam decoder.

Reference parity (search_lm_params.py:38-103): minimize CER or WER over the
beam decoder's LM weight alpha and word bonus beta using the decoder's cheap
``reset_params`` (logits are computed ONCE and decoding is re-run per trial).
optuna is replaced by a self-contained TPE-lite optimizer: a sobol-ish
uniform warmup followed by sampling around the elite set — plus an optional
exhaustive grid mode whose JSON output feeds select_lm_params.py.

Usage:
  python search_lm_params.py model_path=ckpts test_path=val.json \\
      lm_path=3-gram.arpa n_trials=100 output_path=grid.json
"""

from __future__ import annotations

import json
import sys
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from dsjax.config import SpectConfig, compose
from dsjax.data.dataset import SpectrogramDataset, collate
from dsjax.decode.beam import BeamCTCDecoder
from dsjax.decode.greedy import GreedyDecoder
from dsjax.inference import load_model
from dsjax.train.metrics import CharErrorRate, WordErrorRate, update_batch


@dataclass
class OptimizerConfig:
    model_path: str = ""
    test_path: str = ""
    is_character_based: bool = True   # minimize CER (else WER)
    lm_path: str = ""
    beam_width: int = 10
    alpha_from: float = 0.0
    alpha_to: float = 3.0
    beta_from: float = 0.0
    beta_to: float = 1.0
    n_trials: int = 500
    n_jobs: int = 2
    precision: int = 16
    batch_size: int = 8
    num_workers: int = 1
    grid: bool = False                # exhaustive grid instead of TPE-lite
    grid_steps: int = 10
    output_path: str = ""             # write [(alpha, beta, wer, cer), ...]
    seed: int = 0


class Objective:
    """Evaluates (alpha, beta) -> (wer, cer). The acoustic model runs once;
    per-trial cost is decode-only."""

    def __init__(self, cfg: OptimizerConfig):
        self.cfg = cfg
        bundle = load_model(cfg.model_path, cfg.precision)
        self.labels = bundle.labels
        self.decoder = BeamCTCDecoder(self.labels, lm_path=cfg.lm_path or None,
                                      beam_width=cfg.beam_width,
                                      num_processes=cfg.num_workers,
                                      blank_index=self.labels.index("_"))
        self.target_decoder = GreedyDecoder(self.labels,
                                            blank_index=self.labels.index("_"))
        ds = SpectrogramDataset(bundle.spect_cfg, cfg.test_path, self.labels,
                                normalize=True)
        self.cached: List[Tuple[np.ndarray, np.ndarray, List[str]]] = []
        for start in range(0, len(ds), cfg.batch_size):
            samples = [ds[i] for i in range(start, min(start + cfg.batch_size, len(ds)))]
            batch = collate(samples, bucket_frames=64)
            probs, out_lens, _ = bundle.forward(batch.inputs, batch.input_lengths)
            refs = self.target_decoder.convert_to_strings(
                [batch.targets[b, :batch.target_lengths[b]] for b in range(batch.size)])
            self.cached.append((np.asarray(probs), np.asarray(out_lens),
                                [r[0] for r in refs]))

    def __call__(self, alpha: float, beta: float) -> Tuple[float, float]:
        self.decoder.reset_params(alpha, beta)
        wer, cer = WordErrorRate(), CharErrorRate()
        for probs, out_lens, refs in self.cached:
            decoded, _ = self.decoder.decode(probs, out_lens)
            update_batch(wer, cer, [d[0] for d in decoded], refs)
        return wer.compute(), cer.compute()


def tpe_lite(objective: Objective, cfg: OptimizerConfig):
    """Uniform warmup then gaussian sampling around the elite quantile."""
    rng = np.random.default_rng(cfg.seed)
    lo = np.array([cfg.alpha_from, cfg.beta_from])
    hi = np.array([cfg.alpha_to, cfg.beta_to])
    trials: List[Tuple[float, float, float, float]] = []
    n_warmup = max(4, cfg.n_trials // 4)
    for i in range(cfg.n_trials):
        if i < n_warmup or len(trials) < 4:
            x = rng.uniform(lo, hi)
        else:
            key = 3 if cfg.is_character_based else 2
            elite = sorted(trials, key=lambda t: t[key])[: max(2, len(trials) // 4)]
            centers = np.array([[t[0], t[1]] for t in elite])
            c = centers[rng.integers(len(centers))]
            x = np.clip(rng.normal(c, (hi - lo) / 8), lo, hi)
        wer, cer = objective(float(x[0]), float(x[1]))
        trials.append((float(x[0]), float(x[1]), wer, cer))
        print(f"trial {i + 1}/{cfg.n_trials}: alpha={x[0]:.4f} beta={x[1]:.4f} "
              f"wer={wer:.3f} cer={cer:.3f}")
    return trials


def grid_search(objective: Objective, cfg: OptimizerConfig):
    alphas = np.linspace(cfg.alpha_from, cfg.alpha_to, cfg.grid_steps)
    betas = np.linspace(cfg.beta_from, cfg.beta_to, cfg.grid_steps)
    trials = []
    for a in alphas:
        for b in betas:
            wer, cer = objective(float(a), float(b))
            trials.append((float(a), float(b), wer, cer))
            print(f"alpha={a:.3f} beta={b:.3f} wer={wer:.3f} cer={cer:.3f}")
    return trials


def main(argv: Optional[List[str]] = None) -> None:
    cfg = compose(OptimizerConfig, argv if argv is not None else sys.argv[1:])
    objective = Objective(cfg)
    trials = grid_search(objective, cfg) if cfg.grid else tpe_lite(objective, cfg)
    key = 3 if cfg.is_character_based else 2
    best = min(trials, key=lambda t: t[key])
    print(f"Best Params\nalpha: {best[0]}\nbeta: {best[1]}\n"
          f"{'cer' if cfg.is_character_based else 'wer'}: {best[key]}")
    if cfg.output_path:
        with open(cfg.output_path, "w") as f:
            json.dump(trials, f)


if __name__ == "__main__":
    main()
