#!/usr/bin/env python
"""Training CLI (reference parity: train.py).

Usage: python train.py +configs=an4 data.batch_size=8 trainer.max_epochs=3
"""

import sys

from dsjax.config import TrainConfig, compose
from dsjax.workflows import train

if __name__ == "__main__":
    train(compose(TrainConfig, sys.argv[1:]))
