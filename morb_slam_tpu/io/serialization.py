"""Atlas / map checkpointing: npz arrays + json metadata + vocabulary hash.

Replacement for the reference's boost::serialization atlas persistence
(System::SaveAtlas/LoadAtlas, /root/reference/src/System.cc:1384-1504, with
the MD5 vocabulary checksum of System.cc:1506 and the PreSave/PostLoad
pointer-swizzling chain): the struct-of-arrays MapState serializes trivially
— no pointer graph to flatten.
"""
from __future__ import annotations

import hashlib
import json
import os

import jax.numpy as jnp
import numpy as np

from ..mapstate import state as ms

FORMAT_VERSION = 1


def vocab_checksum(voc) -> str:
    """MD5 over vocabulary arrays (reference checksums the vocab file)."""
    h = hashlib.md5()
    for c in voc.centers:
        h.update(np.asarray(c).tobytes())
    h.update(np.asarray(voc.weights).tobytes())
    return h.hexdigest()


def save_map(path: str, m: ms.MapState, meta: dict | None = None,
             voc=None):
    """Write <path>.npz + <path>.json."""
    arrays = {k: np.asarray(v) for k, v in m._asdict().items()}
    np.savez_compressed(path + ".npz", **arrays)
    info = {"format_version": FORMAT_VERSION,
            "fields": list(m._fields)}
    if meta:
        info["meta"] = meta
    if voc is not None:
        info["vocab_md5"] = vocab_checksum(voc)
    with open(path + ".json", "w") as f:
        json.dump(info, f, indent=1)


def load_map(path: str, voc=None) -> ms.MapState:
    """Load a map; verifies the vocabulary checksum when both are given
    (mismatched vocabularies make every stored descriptor meaningless,
    reference LoadAtlas checksum check)."""
    with open(path + ".json") as f:
        info = json.load(f)
    if info["format_version"] != FORMAT_VERSION:
        raise ValueError(f"map format {info['format_version']} != "
                         f"{FORMAT_VERSION}")
    if voc is not None and "vocab_md5" in info:
        if vocab_checksum(voc) != info["vocab_md5"]:
            raise ValueError("vocabulary checksum mismatch — this map was "
                             "built with a different vocabulary")
    data = np.load(path + ".npz")
    return ms.MapState(**{k: jnp.asarray(data[k]) for k in info["fields"]})


def save_vocabulary(path: str, voc):
    from ..vocab.tree import Vocabulary
    np.savez_compressed(
        path, k=voc.k, depth=len(voc.centers),
        weights=np.asarray(voc.weights),
        **{f"centers_{i}": np.asarray(c) for i, c in enumerate(voc.centers)})


def load_vocabulary(path: str):
    from ..vocab.tree import Vocabulary
    d = np.load(path)
    depth = int(d["depth"])
    return Vocabulary(
        centers=tuple(jnp.asarray(d[f"centers_{i}"]) for i in range(depth)),
        weights=jnp.asarray(d["weights"]), k=int(d["k"]))
