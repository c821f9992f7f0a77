"""Label alphabet handling.

The reference stores the output alphabet in ``labels.json`` (29 chars: blank
``"_"`` at index 0, apostrophe, A-Z, space at index 28) and threads the list
through model/decoder construction (reference: labels.json,
deepspeech_pytorch/decoder.py:32-39). We keep the same on-disk format so
manifests/checkpoints interoperate.
"""

from __future__ import annotations

import json
import os
from typing import List, Sequence

DEFAULT_LABELS: List[str] = ["_", "'"] + [chr(c) for c in range(ord("A"), ord("Z") + 1)] + [" "]

BLANK_INDEX = 0


def load_labels(path: str | None = None) -> List[str]:
    """Load the label list from a JSON file; default alphabet if path is None."""
    if path is None:
        return list(DEFAULT_LABELS)
    with open(path, "r", encoding="utf8") as f:
        labels = json.load(f)
    if not isinstance(labels, list) or not all(isinstance(c, str) for c in labels):
        raise ValueError(f"labels file {path} must contain a JSON list of strings")
    return labels


def save_labels(labels: Sequence[str], path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", encoding="utf8") as f:
        json.dump(list(labels), f, indent=2)


class LabelMap:
    """Bidirectional char<->int mapping (reference: decoder.py:32-39).

    ``blank_index`` defaults to 0; ``space_index`` is len(labels) when no
    space is present (out-of-bounds sentinel, same as the reference).
    """

    def __init__(self, labels: Sequence[str], blank_index: int = BLANK_INDEX):
        self.labels = list(labels)
        self.blank_index = blank_index
        self.char_to_int = {c: i for i, c in enumerate(self.labels)}
        self.int_to_char = {i: c for i, c in enumerate(self.labels)}
        self.space_index = self.labels.index(" ") if " " in self.labels else len(self.labels)

    def __len__(self) -> int:
        return len(self.labels)

    def encode(self, transcript: str) -> List[int]:
        """Transcript -> int ids; unknown chars are silently dropped
        (reference: data_loader.py:240)."""
        return [self.char_to_int[c] for c in transcript if c in self.char_to_int]

    def decode(self, ids: Sequence[int]) -> str:
        return "".join(self.int_to_char[int(i)] for i in ids)
