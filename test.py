#!/usr/bin/env python
"""Evaluation CLI (reference parity: test.py).

Usage: python test.py model.model_path=./checkpoints test_path=data/val_manifest.json
"""

import sys

from dsjax.config import EvalConfig, compose
from dsjax.workflows import evaluate

def _maybe_help():
    if any(a in ("-h", "--help") for a in sys.argv[1:]):
        from dsjax.config import print_help

        print_help(EvalConfig, __doc__)
        raise SystemExit(0)


if __name__ == "__main__":
    _maybe_help()
    evaluate(compose(EvalConfig, sys.argv[1:]))
