#!/usr/bin/env python
"""CLI wrapper (reference layout parity: data/librispeech.py)."""
from dsjax.datasets.librispeech import main

if __name__ == "__main__":
    main()
