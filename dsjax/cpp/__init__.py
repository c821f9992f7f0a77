"""Native (C++) extensions: beam+LM decoder, Levenshtein, DSP.

Built via ``python -m dsjax.cpp.build`` (cmake/ninja or direct g++); every
consumer falls back to the Python implementation when the shared objects are
absent, so the framework works without a toolchain.
"""
