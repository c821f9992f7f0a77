"""Greedy (best-path) CTC decoding.

Reference behavior (deepspeech_pytorch/decoder.py:121-181): per-frame argmax,
collapse repeats, drop blanks, return strings plus per-character frame
offsets. The reference does this in a Python loop over frames (O(B*T) host
work per batch); here the argmax AND the collapse mask are computed on device
in one fused vectorized pass, and the host only materializes the final short
strings.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dsjax.labels import LabelMap

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("blank_index",))
def greedy_collapse_device(probs: Array, sizes: Array, blank_index: int = 0
                           ) -> Tuple[Array, Array]:
    """(B, T, C) probs/logits -> (argmax ids (B, T), keep mask (B, T)).

    keep[b, t] is True where the frame contributes a character after CTC
    collapse: not blank, not a repeat of the previous frame, and t < size.
    """
    ids = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    prev = jnp.pad(ids, ((0, 0), (1, 0)), constant_values=-1)[:, :-1]
    t = jnp.arange(ids.shape[1])[None, :]
    sizes = jnp.asarray(sizes)
    keep = (ids != blank_index) & (ids != prev) & (t < sizes[:, None])
    return ids, keep


class GreedyDecoder:
    """API-parity greedy decoder.

    ``decode(probs, sizes)`` returns (strings, offsets) shaped like the
    reference: strings[b] is a single-element list (one best path), offsets
    likewise (reference: decoder.py:125-142).
    """

    # decode() runs on device: callers may pass jax arrays directly and
    # skip the host round-trip (workflows.evaluate keeps posteriors on
    # device for decoders with this flag)
    accepts_device_arrays = True

    def __init__(self, labels: Sequence[str], blank_index: int = 0):
        self.label_map = LabelMap(labels, blank_index)
        self.labels = list(labels)
        self.blank_index = blank_index
        self.int_to_char = self.label_map.int_to_char
        self.space_index = self.label_map.space_index

    def decode(self, probs, sizes: Optional[Sequence[int]] = None,
               n_best: Optional[int] = None
               ) -> Tuple[List[List[str]], List[List[np.ndarray]]]:
        # n_best accepted for signature parity across decoders (greedy has
        # exactly one path)
        del n_best
        probs = jnp.asarray(probs)
        b, t = probs.shape[0], probs.shape[1]
        if sizes is None:
            sizes_arr = jnp.full((b,), t, jnp.int32)
        else:
            sizes_arr = jnp.asarray(sizes, dtype=jnp.int32)
        ids, keep = greedy_collapse_device(probs, sizes_arr, self.blank_index)
        ids_np = np.asarray(ids)
        keep_np = np.asarray(keep)
        strings: List[List[str]] = []
        offsets: List[List[np.ndarray]] = []
        for i in range(b):
            pos = np.nonzero(keep_np[i])[0]
            chars = ids_np[i, pos]
            strings.append(["".join(self.int_to_char[int(c)] for c in chars)])
            offsets.append([pos.astype(np.int32)])
        return strings, offsets

    def convert_to_strings(self, sequences: Sequence[Sequence[int]],
                           sizes: Optional[Sequence[int]] = None,
                           remove_repetitions: bool = False,
                           return_offsets: bool = False):
        """Numeric sequences -> strings (reference: decoder.py:125-162).
        Used for converting flat target ids to reference strings."""
        strings, offsets = [], []
        for x, seq in enumerate(sequences):
            seq = np.asarray(seq)
            n = int(sizes[x]) if sizes is not None else len(seq)
            s = ""
            offs = []
            prev = None
            for i in range(n):
                c = int(seq[i])
                ch = self.int_to_char[c]
                if c != self.blank_index:
                    if remove_repetitions and i != 0 and prev is not None and c == prev:
                        pass
                    else:
                        s += " " if c == self.space_index else ch
                        offs.append(i)
                prev = c
            strings.append([s])
            offsets.append([np.asarray(offs, np.int32)])
        if return_offsets:
            return strings, offsets
        return strings
