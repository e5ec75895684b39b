"""Kind-dispatched sketch (de)serialization for BinaryType columns."""

from __future__ import annotations

from .cuckoo import _MAGIC, CuckooFilter
from .sketches import SKETCH_KINDS
from .sketches.base import load_arrays


def loads(blob: bytes):
    """Deserialize any sketchlib sketch blob (cuckoo or npz-based)."""
    blob = bytes(blob)
    if blob[:4] == _MAGIC:
        return CuckooFilter.from_bytes(blob)
    meta, _ = load_arrays(blob)
    cls = SKETCH_KINDS[meta["kind"]]
    return cls.from_bytes(blob)
