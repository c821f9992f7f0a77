#!/usr/bin/env python
"""Convert an ARPA language model to the mmap-ready DSLMBIN1 binary format.

Equivalent of KenLM's build_binary (the reference's ctcdecode loads KenLM
binaries, reference decoder.py:69-74): O(1) load via mmap, binary-search
queries, ~16 bytes/n-gram + 16 bytes/word.

Usage: python tools/build_lm_binary.py lm.arpa lm.bin
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dsjax.cpp.beam_binding import build_lm_binary

if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        raise SystemExit(2)
    build_lm_binary(sys.argv[1], sys.argv[2])
    print(f"wrote {sys.argv[2]} ({os.path.getsize(sys.argv[2])} bytes)")
