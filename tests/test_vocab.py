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


def test_grouped_candidate_scoring_suppresses_aliasing():
    """Covisibility-group accumulation (reference DetectNBestCandidates,
    KeyFrameDatabase.cc:143-198): an isolated keyframe with the single best
    score must lose to a covisible CLUSTER of good scores, and keyframes
    sharing too few words with the query must be prefiltered out."""
    rng = np.random.default_rng(0)
    K, W = 12, 64
    bow = np.zeros((K, W), np.float32)
    # query overlaps words 0..31
    q = np.zeros(W, np.float32)
    q[:32] = rng.random(32) + 0.5
    q /= q.sum()
    # cluster 1-2-3: covisible, each scores moderately against q
    for i in (1, 2, 3):
        bow[i, :32] = q[:32] + rng.normal(0, 0.004, 32).astype(np.float32)
        bow[i, 32 + i] = 0.35          # perturb so scores are moderate
    # keyframe 8: aliased loner with the best SINGLE score
    bow[8, :32] = q[:32]
    bow[8] *= 1.0
    # keyframe 10: high raw similarity but almost no shared words
    bow[10, 60:] = 1.0
    bow = np.abs(bow)
    bow /= np.clip(bow.sum(axis=1, keepdims=True), 1e-9, None)
    covis = np.zeros((K, K), np.int32)
    for a in (1, 2, 3):
        for b in (1, 2, 3):
            if a != b:
                covis[a, b] = 50
    db = database.KeyframeDatabase(bow=jnp.asarray(bow),
                                   valid=jnp.ones(K, bool))
    ids, scores, ok = database.top_candidates_grouped(
        db, jnp.asarray(q), 3, jnp.asarray(covis))
    ids = np.asarray(ids)
    ok = np.asarray(ok)
    winners = set(ids[ok].tolist())
    # the cluster's best member must be among the winners
    assert winners & {1, 2, 3}, (ids, scores, ok)
    assert 10 not in winners


def test_orbvoc_text_roundtrip(tmp_path):
    """Reference ORBvoc text format (TemplatedVocabulary.h:1338-1430):
    save -> load must reproduce descent (word ids) and weights exactly."""
    rng = np.random.default_rng(5)
    descs = rng.integers(0, 2 ** 32, (600, 8), dtype=np.uint32)
    voc = tree.train(descs, k=4, depth=3, iters=3)
    p = str(tmp_path / "voc.txt")
    tree.save_orbvoc_text(voc, p)
    voc2 = tree.load_orbvoc_text(p)
    assert voc2.k == voc.k and voc2.depth == voc.depth
    q = jnp.asarray(rng.integers(0, 2 ** 32, (64, 8), dtype=np.uint32))
    w1 = np.asarray(tree.transform(voc, q))
    w2 = np.asarray(tree.transform(voc2, q))
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_allclose(np.asarray(voc2.weights),
                               np.asarray(voc.weights), atol=1e-5)


def test_orbvoc_text_incomplete_tree(tmp_path):
    """A DBoW2 tree with an EARLY LEAF (branch terminated above the word
    level) must import with the leaf's weight reachable and descent
    consistent: descriptors equal to the early leaf's center land on its
    propagated word."""
    k, depth = 2, 2
    # root(0) -> nodes 1 (interior), 2 (EARLY LEAF with weight 0.7)
    # node 1 -> leaves 3, 4
    d1 = np.zeros(32, np.uint8)                 # node 1 center: zeros
    d2 = np.full(32, 255, np.uint8)             # node 2 center: ones
    d3 = np.zeros(32, np.uint8); d3[0] = 1      # leaf 3
    d4 = np.zeros(32, np.uint8); d4[0] = 3      # leaf 4
    lines = ["%d %d 0 0" % (k, depth)]
    def node(parent, leaf, b, w):
        lines.append("%d %d %s %f"
                     % (parent, leaf, " ".join(str(x) for x in b), w))
    node(0, 0, d1, 0.0)     # id 1
    node(0, 1, d2, 0.7)     # id 2 — early leaf at level 0
    node(1, 1, d3, 0.3)     # id 3
    node(1, 1, d4, 0.4)     # id 4
    p = str(tmp_path / "voc_inc.txt")
    open(p, "w").write("\n".join(lines) + "\n")
    voc = tree.load_orbvoc_text(p)
    assert voc.n_words == 4
    # a descriptor equal to the early leaf's center must reach its word
    q_ones = jnp.asarray(tree._bytes_to_u32(d2[None]))
    wid = int(tree.transform(voc, q_ones)[0])
    assert float(voc.weights[wid]) == np.float32(0.7)
    # a descriptor equal to leaf 4's center reaches leaf 4's weight
    q4 = jnp.asarray(tree._bytes_to_u32(d4[None]))
    wid4 = int(tree.transform(voc, q4)[0])
    assert float(voc.weights[wid4]) == np.float32(0.4)
