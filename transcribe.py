#!/usr/bin/env python
"""Transcription CLI (reference parity: transcribe.py).

Usage: python transcribe.py model.model_path=./checkpoints audio_path=x.wav
"""

import sys

from dsjax.config import TranscribeConfig, compose
from dsjax.workflows import transcribe

if __name__ == "__main__":
    transcribe(compose(TranscribeConfig, sys.argv[1:]))
