#!/usr/bin/env python
"""Inference server CLI (reference parity: server.py).

Usage: python server.py model.model_path=./checkpoints host=0.0.0.0 port=8888
"""

import sys

from dsjax.config import ServerConfig, compose
from dsjax.server import main

def _maybe_help():
    if any(a in ("-h", "--help") for a in sys.argv[1:]):
        from dsjax.config import print_help

        print_help(ServerConfig, __doc__)
        raise SystemExit(0)


if __name__ == "__main__":
    _maybe_help()
    main(compose(ServerConfig, sys.argv[1:]))
