#!/usr/bin/env python
"""Training CLI (reference parity: train.py).

Usage: python train.py +configs=an4 data.batch_size=8 trainer.max_epochs=3
"""

import sys

from dsjax.config import TrainConfig, compose
from dsjax.workflows import train

def _maybe_help():
    if any(a in ("-h", "--help") for a in sys.argv[1:]):
        from dsjax.config import print_help

        print_help(TrainConfig, __doc__)
        raise SystemExit(0)


if __name__ == "__main__":
    _maybe_help()
    train(compose(TrainConfig, sys.argv[1:]))
