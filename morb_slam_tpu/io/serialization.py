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


# ---------------------------------------------------------------------------
# whole-Atlas persistence (reference System::SaveAtlas serializes EVERY map
# + id counters + rebuilds via Atlas::PostLoad, System.cc:1384-1504)
# ---------------------------------------------------------------------------

ATLAS_VERSION = 1


def save_atlas(path: str, tracker, meta: dict | None = None, voc=None):
    """Serialize the COMPLETE multi-map state: active map, every stashed
    map (with its BoW database and inertial preintegration store), the
    tracker's kf_imu chain, the frame trajectory and the inertial/session
    counters. One npz of arrays + one json manifest."""
    getattr(tracker, "flush", lambda: None)()   # resolve pipelined frame
    arrays = {}

    def put(prefix, d):
        for k, v in d.items():
            arrays[f"{prefix}{k}"] = np.asarray(v)

    put("active.", tracker.m._asdict())
    if tracker.kf_imu is not None:
        put("active_imu.", tracker.kf_imu._asdict())
    stash_meta = []
    for i, st in enumerate(tracker.stash):
        put(f"stash{i}.", st.m._asdict())
        entry = {"gen": st.gen, "n_kf": st.n_kf,
                 "merged_into_gen": st.merged_into_gen,
                 "kf_offset": st.kf_offset,
                 "has_imu": st.kf_imu is not None,
                 "has_db": st.db is not None}
        if st.kf_imu is not None:
            put(f"stash{i}_imu.", st.kf_imu._asdict())
        if st.db is not None:
            arrays[f"stash{i}_db.bow"] = np.asarray(st.db.bow)
            arrays[f"stash{i}_db.valid"] = np.asarray(st.db.valid)
        stash_meta.append(entry)

    # trajectory: relative frame poses + their (gen, ref) anchors
    traj = tracker.trajectory
    if traj:
        arrays["traj.ts"] = np.asarray([e[0] for e in traj], np.float64)
        arrays["traj.gen"] = np.asarray([e[1] for e in traj], np.int32)
        arrays["traj.ref"] = np.asarray([e[2] for e in traj], np.int32)
        arrays["traj.R"] = np.stack([np.asarray(e[3]) for e in traj])
        arrays["traj.t"] = np.stack([np.asarray(e[4]) for e in traj])
    arrays["tracker.bias"] = np.asarray(tracker.bias)

    np.savez_compressed(path + ".npz", **arrays)
    info = {"format_version": FORMAT_VERSION,
            "atlas_version": ATLAS_VERSION,
            "fields": list(tracker.m._fields),
            "stash": stash_meta,
            "map_gen": tracker.map_gen,
            "n_kf_host": tracker.n_kf_host,
            "n_traj": len(traj),
            "imu_ready": bool(getattr(tracker, "imu_ready", False)),
            "viba_stage": int(getattr(tracker, "viba_stage", 0)),
            "ts_first_kf": getattr(tracker, "ts_first_kf", None),
            "has_imu": tracker.kf_imu is not None}
    if meta:
        info["meta"] = meta
    if voc is not None:
        info["vocab_md5"] = vocab_checksum(voc)
    with open(path + ".json", "w") as f:
        json.dump(info, f, indent=1)


def load_atlas(path: str, tracker, voc=None):
    """Restore a full Atlas into `tracker` (reference LoadAtlas +
    Atlas::PostLoad). Verifies the vocabulary checksum; rebuilds the active
    BoW database from descriptors (derived state)."""
    from ..mapstate.atlas import StashedMap
    from ..optim.inertial import KfImu
    with open(path + ".json") as f:
        info = json.load(f)
    if info.get("atlas_version") != ATLAS_VERSION:
        raise ValueError("not an atlas checkpoint (use load_map)")
    if voc is not None and "vocab_md5" in info:
        if vocab_checksum(voc) != info["vocab_md5"]:
            raise ValueError("vocabulary checksum mismatch")
    data = np.load(path + ".npz")

    def get(prefix, fields, cls):
        return cls(**{k: jnp.asarray(data[f"{prefix}{k}"]) for k in fields})

    tracker.m = get("active.", info["fields"], ms.MapState)
    if info.get("has_imu") and tracker.kf_imu is not None:
        tracker.kf_imu = get("active_imu.", KfImu._fields, KfImu)
    tracker.stash = []
    for i, se in enumerate(info["stash"]):
        st_m = get(f"stash{i}.", info["fields"], ms.MapState)
        st_imu = None
        if se["has_imu"]:
            st_imu = get(f"stash{i}_imu.", KfImu._fields, KfImu)
        st_db = None
        if se["has_db"]:
            from ..vocab.database import KeyframeDatabase
            st_db = KeyframeDatabase(
                bow=jnp.asarray(data[f"stash{i}_db.bow"]),
                valid=jnp.asarray(data[f"stash{i}_db.valid"]))
        tracker.stash.append(StashedMap(
            gen=se["gen"], m=st_m, db=st_db, n_kf=se["n_kf"],
            kf_imu=st_imu, merged_into_gen=se["merged_into_gen"],
            kf_offset=se["kf_offset"]))
    tracker.trajectory = []
    if info["n_traj"]:
        ts = data["traj.ts"]
        gen = data["traj.gen"]
        ref = data["traj.ref"]
        Rs = data["traj.R"]
        tts = data["traj.t"]
        tracker.trajectory = [
            (float(ts[i]), int(gen[i]), int(ref[i]),
             jnp.asarray(Rs[i]), jnp.asarray(tts[i]))
            for i in range(len(ts))]
    tracker.map_gen = info["map_gen"]
    tracker.n_kf_host = info["n_kf_host"]
    # newest KF by timestamp (slot order is not temporal once slots recycle)
    if tracker.n_kf_host > 0:
        valid_ts = np.where(np.asarray(tracker.m.kf_valid),
                            np.asarray(tracker.m.kf_ts), -np.inf)
        tracker.last_kf_id = int(np.argmax(valid_ts))
        tracker.kf_seq = tracker.n_kf_host
    tracker.bias = jnp.asarray(data["tracker.bias"])
    tracker.imu_ready = info.get("imu_ready", False)
    tracker.viba_stage = info.get("viba_stage", 0)
    tracker.ts_first_kf = info.get("ts_first_kf")
    # rebuild the ACTIVE map's place-recognition index (derived state —
    # reference PostLoad recomputes BoW structures)
    if voc is not None and tracker.db is not None:
        from ..vocab import database as kfdb, tree as voctree
        tracker.db = kfdb.empty(tracker.m.kf_valid.shape[0], voc.n_words)
        valid = np.asarray(tracker.m.kf_valid)
        for k in range(min(tracker.n_kf_host, len(valid))):
            if not valid[k]:
                continue
            bow = voctree.bow_vector(voc, voctree.transform(
                voc, tracker.m.kf_feat_desc[k], tracker.m.kf_feat_valid[k]))
            tracker.db = kfdb.add_keyframe(tracker.db, k, bow)
    # the session resumes by relocalizing into the restored map
    if tracker.n_kf_host > 0:
        tracker.state = "RECENTLY_LOST"
        tracker.last = None
    return tracker


def save_vocabulary(path: str, voc):
    from ..vocab.tree import Vocabulary
    np.savez_compressed(
        path, k=voc.k, depth=len(voc.centers),
        weights=np.asarray(voc.weights),
        **{f"centers_{i}": np.asarray(c) for i, c in enumerate(voc.centers)})


def load_vocabulary(path: str):
    """Load a vocabulary: .npz (native) or reference DBoW2 text format
    (ORBvoc.txt — System.cc:132 loadFromTextFile equivalent)."""
    from ..vocab.tree import Vocabulary
    if path.endswith(".txt"):
        from ..vocab.tree import load_orbvoc_text
        return load_orbvoc_text(path)
    d = np.load(path)
    depth = int(d["depth"])
    return Vocabulary(
        centers=tuple(jnp.asarray(d[f"centers_{i}"]) for i in range(depth)),
        weights=jnp.asarray(d["weights"]), k=int(d["k"]))
