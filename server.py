#!/usr/bin/env python
"""Inference server CLI (reference parity: server.py).

Usage: python server.py model.model_path=./checkpoints host=0.0.0.0 port=8888
"""

import sys

from dsjax.config import ServerConfig, compose
from dsjax.server import main

if __name__ == "__main__":
    main(compose(ServerConfig, sys.argv[1:]))
