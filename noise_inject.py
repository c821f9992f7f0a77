#!/usr/bin/env python
"""Audition tool: mix one noise file into one wav at a given level and save
the result (reference parity: noise_inject.py:1-25)."""

import argparse

import numpy as np

from dsjax.audio.augment import NoiseInjector
from dsjax.audio.io import load_audio, save_wav

parser = argparse.ArgumentParser()
parser.add_argument("--input-path", default="input.wav", help="clean speech wav to corrupt")
parser.add_argument("--noise-path", default="noise.wav", help="background noise recording")
parser.add_argument("--output-path", default="output.wav", help="where the mixed wav is written")
parser.add_argument("--sample-rate", default=16000, type=int, help="output sample rate (Hz)")
parser.add_argument("--noise-level", type=float, default=1.0,
                    help="noise mix level in [0,1]; larger = noisier output")
args = parser.parse_args()

if __name__ == "__main__":
    import os

    data = load_audio(args.input_path, args.sample_rate)
    injector = NoiseInjector(os.path.dirname(os.path.abspath(args.noise_path)) or ".",
                             args.sample_rate)
    mixed = injector.inject_sample(data, args.noise_path, args.noise_level)
    save_wav(args.output_path, np.asarray(mixed), args.sample_rate)
    print(f"Saved noise-injected audio to {args.output_path}")
