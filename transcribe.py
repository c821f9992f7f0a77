#!/usr/bin/env python
"""Transcription CLI (reference parity: transcribe.py).

Usage: python transcribe.py model.model_path=./checkpoints audio_path=x.wav
"""

import sys

from dsjax.config import TranscribeConfig, compose
from dsjax.workflows import transcribe

def _maybe_help():
    if any(a in ("-h", "--help") for a in sys.argv[1:]):
        from dsjax.config import print_help

        print_help(TranscribeConfig, __doc__)
        raise SystemExit(0)


if __name__ == "__main__":
    _maybe_help()
    transcribe(compose(TranscribeConfig, sys.argv[1:]))
