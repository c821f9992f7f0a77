#!/usr/bin/env python
"""Evaluation CLI (reference parity: test.py).

Usage: python test.py model.model_path=./checkpoints test_path=data/val_manifest.json
"""

import sys

from dsjax.config import EvalConfig, compose
from dsjax.workflows import evaluate

if __name__ == "__main__":
    evaluate(compose(EvalConfig, sys.argv[1:]))
