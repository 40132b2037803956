import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.ops import orb, hamming, match


def checker_image(rng, h=120, w=160, n_blobs=40):
    """Synthetic image with corner-rich structure."""
    img = rng.uniform(20, 60, size=(h, w)).astype(np.float32)
    for _ in range(n_blobs):
        y = rng.integers(10, h - 10)
        x = rng.integers(10, w - 10)
        s = rng.integers(3, 8)
        img[y:y + s, x:x + s] += rng.uniform(80, 160)
    return np.clip(img, 0, 255)


class TestFast:
    def test_fast_matches_opencv(self, rng):
        cv2 = pytest.importorskip("cv2")
        img = checker_image(rng)
        corner, score = jax.jit(orb.fast_response, static_argnums=1)(jnp.asarray(img), 20.0)
        corner = np.asarray(corner)
        det = cv2.FastFeatureDetector_create(threshold=20, nonmaxSuppression=False)
        kps = det.detect(np.round(img).astype(np.uint8), None)
        ref = np.zeros_like(corner)
        for k in kps:
            x, y = int(round(k.pt[0])), int(round(k.pt[1]))
            ref[y, x] = True
        # compare away from borders (our roll wraps around)
        inner = np.s_[4:-4, 4:-4]
        a, b = corner[inner], ref[inner]
        # small numeric differences (float vs uint8 rounding) allowed
        agree = (a == b).mean()
        assert agree > 0.995, f"FAST agreement {agree}"

    def test_fast_detects_synthetic_corner(self):
        img = np.full((64, 64), 50, np.float32)
        img[30:, 30:] = 200.0
        corner, score = orb.fast_response(jnp.asarray(img), 20.0)
        corner = np.asarray(corner)
        # corners of the bright square should fire near (30, 30)
        assert corner[28:33, 28:33].any()
        # flat regions must not fire
        assert not corner[5:20, 5:20].any()
        assert not corner[40:60, 40:60].any()


class TestExtractor:
    @pytest.fixture(scope="class")
    def extractor(self):
        cfg = orb.ORBConfig(n_features=500, n_levels=4)
        return orb.ORBExtractor(cfg, (120, 160))

    @pytest.fixture(scope="class")
    def result(self, extractor):
        rng = np.random.default_rng(3)
        img = checker_image(rng)
        return img, jax.jit(extractor.__call__)(jnp.asarray(img))

    def test_shapes_and_validity(self, extractor, result):
        _, kp = result
        assert kp.n == extractor.n_total == 500
        v = np.asarray(kp.valid)
        assert v.sum() > 50
        xy = np.asarray(kp.xy)[v]
        assert (xy[:, 0] >= 0).all() and (xy[:, 0] < 160 * 1.001).all()
        assert (xy[:, 1] >= 0).all() and (xy[:, 1] < 120 * 1.001).all()

    def test_level_budgets_geometric(self, extractor):
        b = extractor.level_budgets
        assert sum(b) == 500
        assert b[0] > b[1] > b[2]

    def test_keypoints_on_structure(self, result):
        img, kp = result
        v = np.asarray(kp.valid) & (np.asarray(kp.octave) == 0)
        xy = np.asarray(kp.xy)[v].astype(int)
        # keypoints should lie near intensity structure: local std > global min
        patch_std = []
        for x, y in xy[:50]:
            p = img[max(0, y - 2):y + 3, max(0, x - 2):x + 3]
            patch_std.append(p.std())
        assert np.median(patch_std) > 5.0

    def test_spatial_distribution(self, result):
        """Grid-bucketed top-k should spread keypoints across the image."""
        img, kp = result
        v = np.asarray(kp.valid)
        xy = np.asarray(kp.xy)[v]
        occupied = set((int(x) // 40, int(y) // 40) for x, y in xy)
        assert len(occupied) >= 8  # of 4x3 = 12 coarse cells

    def test_rotation_invariance_of_descriptors(self, rng):
        """Rotating the image should leave descriptors nearly unchanged
        (rBRIEF property; validates orientation + pattern rotation)."""
        cv2 = pytest.importorskip("cv2")
        img = checker_image(rng, 160, 160)
        cfg = orb.ORBConfig(n_features=300, n_levels=1)
        ex = orb.ORBExtractor(cfg, (160, 160))
        kp1 = ex(jnp.asarray(img))
        angle = 30.0
        m = cv2.getRotationMatrix2D((80, 80), angle, 1.0)
        rot = cv2.warpAffine(img, m, (160, 160))
        kp2 = ex(jnp.asarray(rot))
        # match by descriptor, verify matches are geometrically consistent
        d = hamming.distance_matrix(kp1.desc, kp2.desc, kp1.valid, kp2.valid)
        mut = np.asarray(hamming.mutual_best(d))
        xy1 = np.asarray(kp1.xy)
        xy2 = np.asarray(kp2.xy)
        t = np.deg2rad(-angle)
        rot_m = np.array([[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]])
        good = 0
        total = 0
        for i, j in enumerate(mut):
            if j < 0 or not kp1.valid[i]:
                continue
            pred = (xy1[i] - 80) @ rot_m.T + 80
            if np.linalg.norm(pred - xy2[j]) < 3.0:
                good += 1
            total += 1
        assert total >= 30
        assert good / total > 0.5, f"rotation-consistent {good}/{total}"


class TestPacking:
    def test_pack_unpack_roundtrip(self, rng):
        bits = (rng.random((16, 256)) > 0.5).astype(np.uint8)
        packed = orb.pack_bits(jnp.asarray(bits))
        assert packed.shape == (16, 8)
        un = np.asarray(orb.unpack_bits(packed))
        np.testing.assert_array_equal(un, bits)


class TestHamming:
    def test_distance_matrix_exact(self, rng):
        bits_a = (rng.random((32, 256)) > 0.5).astype(np.uint8)
        bits_b = (rng.random((48, 256)) > 0.5).astype(np.uint8)
        da = orb.pack_bits(jnp.asarray(bits_a))
        db = orb.pack_bits(jnp.asarray(bits_b))
        d = np.asarray(hamming.distance_matrix(da, db))
        ref = (bits_a[:, None, :] != bits_b[None, :, :]).sum(-1)
        np.testing.assert_array_equal(d, ref)

    def test_invalid_masking(self, rng):
        bits = (rng.random((8, 256)) > 0.5).astype(np.uint8)
        d = orb.pack_bits(jnp.asarray(bits))
        va = jnp.array([True] * 4 + [False] * 4)
        dist = np.asarray(hamming.distance_matrix(d, d, va, va))
        assert (dist[4:] == hamming.INVALID_DIST).all()
        assert (dist[:, 4:] == hamming.INVALID_DIST).all()
        assert (dist[:4, :4] <= 256).all()

    def test_pairwise(self, rng):
        bits_a = (rng.random((10, 256)) > 0.5).astype(np.uint8)
        bits_b = (rng.random((10, 256)) > 0.5).astype(np.uint8)
        da = orb.pack_bits(jnp.asarray(bits_a))
        db = orb.pack_bits(jnp.asarray(bits_b))
        d = np.asarray(hamming.pairwise_distance(da, db))
        ref = (bits_a != bits_b).sum(-1)
        np.testing.assert_array_equal(d, ref)

    def test_mutual_best_identity(self, rng):
        bits = (rng.random((20, 256)) > 0.5).astype(np.uint8)
        d = orb.pack_bits(jnp.asarray(bits))
        dist = hamming.distance_matrix(d, d)
        mut = np.asarray(hamming.mutual_best(dist))
        np.testing.assert_array_equal(mut, np.arange(20))

    def test_rotation_consistency(self):
        n = 100
        angles_a = np.zeros(n, np.float32)
        angles_b = np.full(n, 0.3, np.float32)
        # outliers spread over distinct bins, each < 10% of the main bin
        angles_b[:4] = 1.5
        angles_b[4:8] = 3.0
        mask = np.ones(n, bool)
        keep = np.asarray(hamming.rotation_consistency_mask(
            jnp.asarray(angles_a), jnp.asarray(angles_b), jnp.asarray(mask)))
        assert keep[8:].all()
        assert not keep[:8].any()


class TestWindowedMatch:
    def test_windowed_match_finds_shifted_points(self, rng):
        n = 64
        bits = (rng.random((n, 256)) > 0.5).astype(np.uint8)
        desc = orb.pack_bits(jnp.asarray(bits))
        xy = rng.uniform(50, 400, size=(n, 2)).astype(np.float32)
        kp = orb.Keypoints(
            xy=jnp.asarray(xy),
            response=jnp.ones((n,)),
            angle=jnp.zeros((n,)),
            octave=jnp.zeros((n,), jnp.int32),
            size=jnp.full((n,), 31.0),
            desc=desc,
            valid=jnp.ones((n,), bool),
        )
        # queries = same descriptors, positions shifted by < radius
        q_uv = jnp.asarray(xy + rng.uniform(-3, 3, size=(n, 2)).astype(np.float32))
        res = match.windowed_match(
            q_uv, desc, jnp.ones((n,), bool),
            jnp.full((n,), 5.0), jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32),
            kp, max_dist=50,
        )
        np.testing.assert_array_equal(np.asarray(res.best_kp), np.arange(n))
        np.testing.assert_array_equal(np.asarray(res.assoc), np.arange(n))

    def test_conflict_resolution(self):
        # two queries target the same keypoint; closer descriptor wins
        bits_kp = np.zeros((1, 256), np.uint8)
        desc_kp = orb.pack_bits(jnp.asarray(bits_kp))
        bits_q = np.zeros((2, 256), np.uint8)
        bits_q[1, :10] = 1  # query 1 is 10 bits away
        desc_q = orb.pack_bits(jnp.asarray(bits_q))
        kp = orb.Keypoints(
            xy=jnp.zeros((1, 2)), response=jnp.ones((1,)), angle=jnp.zeros((1,)),
            octave=jnp.zeros((1,), jnp.int32), size=jnp.ones((1,)),
            desc=desc_kp, valid=jnp.ones((1,), bool),
        )
        res = match.windowed_match(
            jnp.zeros((2, 2)), desc_q, jnp.ones((2,), bool),
            jnp.full((2,), 5.0), jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32),
            kp, max_dist=50,
        )
        assert int(res.assoc[0]) == 0
        assert int(res.best_kp[0]) == 0
        assert int(res.best_kp[1]) == -1

    def test_predict_scale(self):
        lvl = match.predict_scale_level(
            jnp.asarray([10.0, 5.0, 1.0]), jnp.asarray([10.0, 10.0, 10.0]), 1.2, 8)
        out = np.asarray(lvl)
        assert out[0] == 0
        assert out[1] == int(np.ceil(np.log(2.0) / np.log(1.2)))
        assert out[2] == 7  # clipped


def quadtree_distribute(xy: np.ndarray, response: np.ndarray,
                        w: int, h: int, n_target: int) -> np.ndarray:
    """Reference DistributeOctTree (ORBextractor.cc:617-923) re-implemented
    for analysis: recursively split occupied cells until the node count
    reaches the budget, then keep the best-response keypoint per node.
    Returns indices of retained keypoints."""
    nodes = [(0.0, 0.0, float(w), float(h), np.arange(len(xy)))]
    while len(nodes) < n_target:
        # split the node with the most keypoints (the reference splits all
        # expandable nodes per round, biggest first; equivalent budget-wise)
        order = np.argsort([-len(n[4]) for n in nodes])
        splittable = [i for i in order if len(nodes[order[0]][4]) > 1]
        if not splittable or len(nodes[order[0]][4]) <= 1:
            break
        i = order[0]
        x0, y0, x1, y1, idx = nodes.pop(i)
        mx, my = (x0 + x1) / 2, (y0 + y1) / 2
        for (a, b, c, d) in [(x0, y0, mx, my), (mx, y0, x1, my),
                             (x0, my, mx, y1), (mx, my, x1, y1)]:
            sel = idx[(xy[idx, 0] >= a) & (xy[idx, 0] < c)
                      & (xy[idx, 1] >= b) & (xy[idx, 1] < d)]
            if len(sel):
                nodes.append((a, b, c, d, sel))
    keep = [n[4][np.argmax(response[n[4]])] for n in nodes]
    return np.array(sorted(keep))


class TestQuadtreeEquivalence:
    """ROADMAP accuracy-delta check: the grid-bucketed top-k must produce a
    spatial distribution statistically equivalent to the reference's
    quadtree DistributeOctTree."""

    def test_grid_topk_matches_quadtree_statistics(self, rng):
        from orbslam2_tpu.ops import orb as orb_mod
        img = rng.uniform(0, 255, (240, 320)).astype(np.float32)
        k = orb_mod.gaussian_kernel1d(1.2, 3)
        img = np.asarray(orb_mod._separable_conv(jnp.asarray(img), k))
        cfg = orb_mod.ORBConfig(n_features=400, n_levels=1, use_pallas=False)
        ex = orb_mod.ORBExtractor(cfg, img.shape)
        kp = jax.jit(ex.__call__)(jnp.asarray(img))
        v = np.asarray(kp.valid)
        ours = np.asarray(kp.xy)[v]

        # quadtree over the same FAST candidate pool
        corner, score = orb_mod.fast_response(jnp.asarray(img), cfg.ini_th_fast)
        corner = np.asarray(corner).copy()
        score = np.asarray(score)
        m = orb_mod.EDGE_MARGIN
        corner[:m] = corner[-m:] = False
        corner[:, :m] = corner[:, -m:] = False
        cy, cx = np.where(corner)
        cand_xy = np.stack([cx, cy], 1).astype(np.float32)
        cand_resp = score[cy, cx]
        qt = quadtree_distribute(cand_xy, cand_resp, 320, 240, len(ours))
        qt_xy = cand_xy[qt]

        # compare occupancy statistics on a 8x6 grid
        def occupancy(pts):
            hgrid = np.zeros((6, 8))
            np.add.at(hgrid, (np.clip(pts[:, 1] // 40, 0, 5).astype(int),
                              np.clip(pts[:, 0] // 40, 0, 7).astype(int)), 1)
            return hgrid / hgrid.sum()

        ho, hq = occupancy(ours), occupancy(qt_xy)
        # both should be similarly uniform: compare entropy and L1 gap
        ent = lambda hgrid: -np.sum(hgrid[hgrid > 0] * np.log(hgrid[hgrid > 0]))
        e_o, e_q = ent(ho), ent(hq)
        assert e_o > 0.9 * e_q, (e_o, e_q)
        assert np.abs(ho - hq).sum() < 0.5, np.abs(ho - hq).sum()
