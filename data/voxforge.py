#!/usr/bin/env python
"""CLI wrapper (reference layout parity: data/voxforge.py)."""
from dsjax.datasets.voxforge import main

if __name__ == "__main__":
    main()
