#!/usr/bin/env python
"""CLI wrapper (reference layout parity: data/common_voice.py)."""
from dsjax.datasets.common_voice import main

if __name__ == "__main__":
    main()
