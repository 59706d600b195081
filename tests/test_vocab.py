"""Vocabulary + place recognition tests: training convergence, transform
consistency, scoring discrimination on synthetic imagery."""
import jax.numpy as jnp
import numpy as np
import pytest

from morb_slam_tpu import frontend
from morb_slam_tpu.vocab import database, tree

from synthetic_world import PlaneWorld, camera_path


@pytest.fixture(scope="module")
def voc_and_frames():
    """Train a small vocabulary on descriptors from synthetic views; keep
    per-view descriptor sets for scoring tests."""
    W, H, FX = 320, 240, 260.0
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    world = PlaneWorld(K, W, H, seed=3)
    poses = camera_path(12, step=0.35)
    cfg = frontend.OrbConfig(n_features=300, n_levels=4)
    frames = []
    all_desc = []
    for R, t in poses:
        img = jnp.asarray(world.render(R, t), jnp.float32)
        f = frontend.extract_orb(img, cfg)
        frames.append(f)
        all_desc.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = tree.train(np.concatenate(all_desc), k=6, depth=3, iters=4)
    return voc, frames


def test_transform_assigns_all(voc_and_frames):
    voc, frames = voc_and_frames
    ids = tree.transform(voc, frames[0].desc, frames[0].valid)
    v = np.asarray(frames[0].valid)
    assert (np.asarray(ids)[v] >= 0).all()
    assert (np.asarray(ids)[v] < voc.n_words).all()
    assert (np.asarray(ids)[~v] == -1).all()


def test_transform_nearby_words_stable(voc_and_frames):
    """A descriptor must map to the word whose leaf center is (near)
    closest — check greedy descent quality vs brute-force leaf search."""
    voc, frames = voc_and_frames
    d = frames[0].desc[np.asarray(frames[0].valid)][:64]
    ids = np.asarray(tree.transform(voc, d))
    from morb_slam_tpu.ops import hamming
    leaf = np.asarray(hamming.hamming_matrix(d, voc.centers[-1]))
    brute = leaf.argmin(axis=1)
    greedy_dist = leaf[np.arange(len(d)), ids]
    brute_dist = leaf[np.arange(len(d)), brute]
    # greedy descent is approximate; demand near-optimal on average
    assert (greedy_dist - brute_dist).mean() < 8.0


def test_self_similarity_highest(voc_and_frames):
    """Each view must score itself above all clearly different views."""
    voc, frames = voc_and_frames
    bows = jnp.stack([
        tree.bow_vector(voc, tree.transform(voc, f.desc, f.valid))
        for f in frames])
    S = np.asarray(tree.l1_score(bows, bows))
    n = len(frames)
    for i in range(n):
        # self-score is 1.0 (normalized); distant views must score lower
        assert S[i, i] > 0.99
        for j in range(n):
            if abs(i - j) >= 4:
                assert S[i, j] < S[i, i] - 0.2, (i, j, S[i, j])


def test_neighbor_views_score_higher_than_distant(voc_and_frames):
    voc, frames = voc_and_frames
    bows = jnp.stack([
        tree.bow_vector(voc, tree.transform(voc, f.desc, f.valid))
        for f in frames])
    S = np.asarray(tree.l1_score(bows, bows))
    n = len(frames)
    near, far = [], []
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            (near if abs(i - j) == 1 else far)[0:0] = [S[i, j]]
    assert np.mean(near) > np.mean(far) + 0.05


def test_database_query(voc_and_frames):
    voc, frames = voc_and_frames
    db = database.empty(16, voc.n_words)
    bows = [tree.bow_vector(voc, tree.transform(voc, f.desc, f.valid))
            for f in frames]
    for i, b in enumerate(bows):
        db = database.add_keyframe(db, i, b)
    # query with frame 5's bow, excluding itself and neighbors
    exclude = jnp.zeros(16, bool).at[4:7].set(True)
    ids, scores, ok = database.top_candidates(db, bows[5], 3,
                                              exclude=exclude)
    assert 5 not in np.asarray(ids)[np.asarray(ok)]
    # best non-excluded candidate should be a spatial neighbor (3 or 7)
    assert int(ids[0]) in (3, 7)
