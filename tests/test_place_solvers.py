"""Vocabulary/KFDB + Horn-Sim3 + EPnP solver tests."""
import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.geometry import se3, sim3
from orbslam2_tpu.geometry.camera import PinholeCamera
from orbslam2_tpu.ops.orb import pack_bits
from orbslam2_tpu.place import vocabulary as voc_mod
from orbslam2_tpu.slammap.keyframe_db import KeyFrameDatabase
from orbslam2_tpu.solvers import epnp, horn

CAM = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0)


def make_descriptor_corpus(rng, n_clusters=50, per_cluster=40, flip_p=0.05):
    """Descriptors clustered around prototypes with bit noise."""
    protos = (rng.random((n_clusters, 256)) > 0.5)
    descs, labels = [], []
    for c in range(n_clusters):
        flips = rng.random((per_cluster, 256)) < flip_p
        descs.append(np.logical_xor(protos[c][None, :], flips))
        labels.extend([c] * per_cluster)
    bits = np.concatenate(descs).astype(np.uint8)
    return np.asarray(pack_bits(jnp.asarray(bits))), np.array(labels), protos


class TestVocabulary:
    def test_same_cluster_same_word(self, rng):
        packed, labels, protos = make_descriptor_corpus(rng)
        voc = voc_mod.train_vocabulary(packed, k=8, levels=2, seed=1)
        ids = np.asarray(voc.transform_packed(packed, np.ones(len(labels), bool)))
        # descriptors from the same cluster should mostly map to the same word
        purity = []
        for c in np.unique(labels):
            words = ids[labels == c]
            purity.append((words == np.bincount(words).argmax()).mean())
        assert np.mean(purity) > 0.8, np.mean(purity)

    def test_bow_similarity_discriminates(self, rng):
        packed, labels, _ = make_descriptor_corpus(rng)
        voc = voc_mod.train_vocabulary(packed, k=8, levels=2, seed=1)
        n = len(labels)
        ids = np.asarray(voc.transform_packed(packed, np.ones(n, bool)))
        # "image" A, A' share clusters; B uses different clusters
        a = voc.bow_vector(ids[labels < 10])
        a2 = voc.bow_vector(ids[(labels < 10)][::2])
        b = voc.bow_vector(ids[(labels >= 30) & (labels < 40)])
        assert voc.score_l1(a, a2) > 3 * voc.score_l1(a, b)

    def test_save_load_roundtrip(self, rng, tmp_path):
        packed, labels, _ = make_descriptor_corpus(rng, n_clusters=10, per_cluster=20)
        voc = voc_mod.train_vocabulary(packed, k=4, levels=2, seed=1)
        p = str(tmp_path / "voc.npz")
        voc_mod.save_vocabulary(voc, p)
        voc2 = voc_mod.load_vocabulary(p)
        ids1 = np.asarray(voc.transform_packed(packed, np.ones(len(labels), bool)))
        ids2 = np.asarray(voc2.transform_packed(packed, np.ones(len(labels), bool)))
        np.testing.assert_array_equal(ids1, ids2)


class TestKeyFrameDatabase:
    def test_loop_candidates(self, rng):
        packed, labels, _ = make_descriptor_corpus(rng)
        voc = voc_mod.train_vocabulary(packed, k=8, levels=2, seed=1)
        ids = np.asarray(voc.transform_packed(packed, np.ones(len(labels), bool)))
        db = KeyFrameDatabase(voc, max_keyframes=16)
        # KFs 0..3: distinct scenes; KF 4 revisits scene of KF 0
        scenes = [ids[(labels >= 10 * i) & (labels < 10 * (i + 1))] for i in range(4)]
        for k in range(4):
            db.add(k, scenes[k])
        db.add(4, scenes[0][::2])
        w = np.zeros((16, 16), np.int64)
        w[4, 3] = w[3, 4] = 50  # KF4 covisible only with KF3

        class FakeMap:
            pass
        cands = db.detect_loop_candidates(4, min_score=0.05, w=w, m=FakeMap())
        assert 0 in cands
        assert 3 not in cands  # covisible excluded

    def test_reloc_candidates(self, rng):
        packed, labels, _ = make_descriptor_corpus(rng)
        voc = voc_mod.train_vocabulary(packed, k=8, levels=2, seed=1)
        ids = np.asarray(voc.transform_packed(packed, np.ones(len(labels), bool)))
        db = KeyFrameDatabase(voc, max_keyframes=16)
        for k in range(4):
            db.add(k, ids[(labels >= 10 * k) & (labels < 10 * (k + 1))])
        w = np.zeros((16, 16), np.int64)
        query = ids[(labels >= 20) & (labels < 30)][::3]  # scene of KF2
        cands = db.detect_reloc_candidates(query, w)
        assert cands[0] == 2


class TestSparseKFDB:
    def test_sparse_scores_match_dense_formula(self, rng):
        """score = sum min(v1, v2) must equal 1 - 0.5|v1-v2|_1 computed on
        the full dense vectors (DBoW2 L1 scoring identity)."""
        packed, labels, _ = make_descriptor_corpus(rng)
        voc = voc_mod.train_vocabulary(packed, k=8, levels=2, seed=1)
        ids = np.asarray(voc.transform_packed(packed, np.ones(len(labels), bool)))
        db = KeyFrameDatabase(voc, max_keyframes=8)
        for k in range(5):
            db.add(k, ids[k * 300:(k + 1) * 300])
        q = voc.bow_vector(ids[100:500])
        sparse_scores = db.score_against_all(q)
        for k in range(5):
            dense = db.dense_bow(k)
            expect = 1.0 - 0.5 * np.abs(dense - q).sum()
            assert abs(sparse_scores[k] - expect) < 1e-4
            assert abs(db.score_kf(q, k) - expect) < 1e-4
        assert sparse_scores[6] == -1.0  # empty slots invalid

    def test_reference_scale_vocabulary_database(self):
        """The sparse layout must handle a reference-scale vocabulary
        (~100k words — impossible for the round-1 dense [K, n_words]
        matrix: 1536 x 1e5 x 4B = 600 MB) with interactive query times at
        KITTI keyframe counts."""
        import time
        rng = np.random.default_rng(3)
        n_words = 100_000
        voc = voc_mod.Vocabulary(
            k=10, levels=5, centers=[],
            word_weights=np.ones(n_words, np.float32), n_words=n_words)
        db = KeyFrameDatabase(voc, max_keyframes=1536)
        n_kf = 1400
        for k in range(n_kf):
            db.add(k, rng.integers(0, n_words, 1500))
        assert db.wids.nbytes + db.wts.nbytes < 60e6
        q = voc.bow_vector(rng.integers(0, n_words, 1500))
        t0 = time.perf_counter()
        scores = db.score_against_all(q)
        common = db._common_words(q)
        t = time.perf_counter() - t0
        assert scores.shape == (1536,) and common.shape == (1536,)
        # generous bound: interactive-scale, robust to CI CPU contention
        # (measured ~0.1s alone; flaked at 0.512s under a concurrent bench)
        assert t < 1.5, f"scale query {t:.3f}s"
        w = np.zeros((1536, 1536), np.int32)
        t0 = time.perf_counter()
        db.detect_reloc_candidates(rng.integers(0, n_words, 1500), w)
        t = time.perf_counter() - t0
        assert t < 2.0, f"reloc candidates {t:.3f}s at scale"


class TestHornSim3:
    def test_umeyama_exact(self, rng):
        src = rng.normal(size=(30, 3)).astype(np.float32)
        s_true = 1.7
        r_true = np.asarray(se3.so3_exp(jnp.asarray(
            np.array([0.3, -0.2, 0.5], np.float32))))
        t_true = np.array([1.0, -2.0, 0.5], np.float32)
        dst = s_true * src @ r_true.T + t_true
        s, r, t = horn.umeyama(jnp.asarray(src), jnp.asarray(dst))
        assert abs(float(s) - s_true) < 1e-3
        np.testing.assert_allclose(np.asarray(r), r_true, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-3)

    def test_sim3_ransac_with_outliers(self, rng):
        n = 100
        pts1 = rng.uniform(-2, 2, (n, 3)).astype(np.float32) + [0, 0, 6]
        s_true = 1.3
        r_true = np.asarray(se3.so3_exp(jnp.asarray(np.array([0.1, 0.2, -0.1], np.float32))))
        t_true = np.array([0.4, -0.2, 0.3], np.float32)
        # pts1 = S12 * pts2  =>  pts2 = (1/s) R^T (pts1 - t)
        pts2 = (pts1 - t_true) @ r_true / s_true
        pts2 = pts2.astype(np.float32)
        pts2[:20] += rng.uniform(1, 3, (20, 3)).astype(np.float32)  # outliers
        res = horn.sim3_ransac(
            jnp.asarray(pts1), jnp.asarray(pts2), jnp.ones(n, bool),
            jnp.ones(n, jnp.float32), jnp.ones(n, jnp.float32),
            CAM, jax.random.PRNGKey(0))
        assert bool(res.success)
        s, r, t = sim3.split(res.s12)
        assert abs(float(s) - s_true) < 0.02
        np.testing.assert_allclose(np.asarray(r), r_true, atol=0.02)
        inl = np.asarray(res.inliers)
        assert inl[:20].mean() < 0.2 and inl[20:].mean() > 0.9

    def test_fix_scale(self, rng):
        n = 60
        pts1 = rng.uniform(-2, 2, (n, 3)).astype(np.float32) + [0, 0, 6]
        r_true = np.asarray(se3.so3_exp(jnp.asarray(np.array([0.1, 0.0, 0.1], np.float32))))
        t_true = np.array([0.2, 0.1, -0.1], np.float32)
        pts2 = ((pts1 - t_true) @ r_true).astype(np.float32)
        res = horn.sim3_ransac(
            jnp.asarray(pts1), jnp.asarray(pts2), jnp.ones(n, bool),
            jnp.ones(n, jnp.float32), jnp.ones(n, jnp.float32),
            CAM, jax.random.PRNGKey(1), fix_scale=True)
        s, _, _ = sim3.split(res.s12)
        assert abs(float(s) - 1.0) < 1e-4


class TestEPnP:
    def make_problem(self, rng, n=80, noise=0.5, outlier_frac=0.0):
        pts = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(4, 12, n)
        xi = (rng.normal(size=6) * 0.3).astype(np.float32)
        tcw = np.asarray(se3.exp(jnp.asarray(xi)))
        uv, _ = CAM.project(se3.apply(jnp.asarray(tcw), jnp.asarray(pts)))
        uv = np.array(uv) + rng.normal(size=(n, 2)).astype(np.float32) * noise
        n_out = int(n * outlier_frac)
        if n_out:
            uv[:n_out] += rng.uniform(30, 90, (n_out, 2)).astype(np.float32)
        return pts, uv.astype(np.float32), tcw, n_out

    def test_clean(self, rng):
        pts, uv, tcw_true, _ = self.make_problem(rng, noise=0.0)
        res = epnp.epnp_ransac(
            jnp.asarray(pts), jnp.asarray(uv), jnp.ones(len(pts), bool),
            jnp.ones(len(pts), jnp.float32), CAM, jax.random.PRNGKey(0))
        assert bool(res.success)
        err = np.linalg.norm(np.asarray(se3.log(
            se3.compose(res.tcw, se3.inverse(jnp.asarray(tcw_true))))))
        assert err < 0.01, err

    def test_minimal_4pt_solve(self, rng):
        """The reference samples 4-point minimal sets (PnPsolver.cc:129)
        solved via the N=1..3 beta cases + Gauss-Newton. On a 4-point set
        the M-matrix nullspace is 4-dimensional and the true solution can
        mix all four basis vectors, so (as with the reference's EPnP) only
        a fraction of minimal draws solve tightly — RANSAC consensus
        absorbs the rest. Assert that fraction stays healthy."""
        errs = []
        for seed in range(12):
            r = np.random.default_rng(seed)
            pts, uv, tcw_true, _ = self.make_problem(r, n=4, noise=0.0)
            w = jnp.ones(4, jnp.float32)
            tcw = epnp._solve_epnp(jnp.asarray(pts), jnp.asarray(uv), w, CAM)
            errs.append(float(np.linalg.norm(np.asarray(se3.log(
                se3.compose(tcw, se3.inverse(jnp.asarray(tcw_true))))))))
        assert sum(e < 0.01 for e in errs) >= 4, errs

    def test_outliers(self, rng):
        pts, uv, tcw_true, n_out = self.make_problem(rng, noise=0.5, outlier_frac=0.3)
        res = epnp.epnp_ransac(
            jnp.asarray(pts), jnp.asarray(uv), jnp.ones(len(pts), bool),
            jnp.ones(len(pts), jnp.float32), CAM, jax.random.PRNGKey(0))
        assert bool(res.success)
        err = np.linalg.norm(np.asarray(se3.log(
            se3.compose(res.tcw, se3.inverse(jnp.asarray(tcw_true))))))
        assert err < 0.05, err
        inl = np.asarray(res.inliers)
        assert inl[:n_out].mean() < 0.1


class TestLargeVocabulary:
    def test_large_vocab_loads_and_discriminates(self, rng):
        """The shipped 10k-word k=10 depth-4 tree (tools/train_large_voc.py)
        must load, transform, and rank a same-place view above a
        different-place view by BoW L1 score."""
        from orbslam2_tpu.place.pretrained import get_large_vocabulary

        voc = get_large_vocabulary()
        assert voc.n_words >= 1000  # falls back to small if artifact missing
        # three synthetic descriptor "views": A, A-perturbed, B
        base = rng.integers(0, 2, size=(300, 256)).astype(np.uint8)
        pert = base.copy()
        flip = rng.uniform(size=pert.shape) < 0.02
        pert[flip] ^= 1
        other = rng.integers(0, 2, size=(300, 256)).astype(np.uint8)
        valid = np.ones(300, bool)
        ids_a = np.asarray(voc.transform_packed(pack_bits(jnp.asarray(base)), valid))
        ids_p = np.asarray(voc.transform_packed(pack_bits(jnp.asarray(pert)), valid))
        ids_b = np.asarray(voc.transform_packed(pack_bits(jnp.asarray(other)), valid))
        va, vp, vb = voc.bow_vector(ids_a), voc.bow_vector(ids_p), voc.bow_vector(ids_b)
        assert voc.score_l1(va, vp) > 2.0 * voc.score_l1(va, vb)
