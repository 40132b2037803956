// mapgraph: native host-side map-graph computations.
//
// The reference implements its map bookkeeping (covisibility counting,
// MapPoint descriptor election, normals/scale bands, observation scans) as
// C++ member functions over pointer graphs (/root/reference/src/KeyFrame.cc,
// MapPoint.cc). In this framework the map is flat arrays; these routines are
// the native equivalents operating directly on those arrays — called via
// ctypes, with a pure-numpy fallback (slammap/native.py).
//
// All functions are stateless over caller-owned buffers: no allocation
// ownership crosses the boundary, no global state, safe to call from any
// thread as long as the caller serializes writes to the arrays.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <vector>

extern "C" {

// Covisibility weights: W[k1,k2] = number of shared map points.
// kf_pt: [K, N] int32 (point id per keypoint slot, -1 = none)
// kf_valid: [K] uint8; pt_valid: [P] uint8
// out_w: [K, K] int32 (caller-zeroed not required; fully overwritten)
void mg_covis_weights(const int32_t* kf_pt, const uint8_t* kf_valid,
                      const uint8_t* pt_valid, int K, int N, int P,
                      int32_t* out_w) {
    std::memset(out_w, 0, sizeof(int32_t) * (size_t)K * K);
    // inverted index: point -> observing keyframes
    std::vector<int32_t> head(P, -1);
    std::vector<int32_t> next;   // linked list over observations
    std::vector<int32_t> obs_kf;
    next.reserve((size_t)K * 8);
    obs_kf.reserve((size_t)K * 8);
    for (int k = 0; k < K; ++k) {
        if (!kf_valid[k]) continue;
        const int32_t* row = kf_pt + (size_t)k * N;
        int32_t last_pt = -1;  // slots for the same point are rare; no dedup needed
        (void)last_pt;
        for (int i = 0; i < N; ++i) {
            int32_t p = row[i];
            if (p < 0 || p >= P || !pt_valid[p]) continue;
            obs_kf.push_back(k);
            next.push_back(head[p]);
            head[p] = (int32_t)obs_kf.size() - 1;
        }
    }
    // accumulate pairwise counts per point
    std::vector<int32_t> ks;
    for (int p = 0; p < P; ++p) {
        if (head[p] < 0) continue;
        ks.clear();
        for (int32_t it = head[p]; it >= 0; it = next[it]) ks.push_back(obs_kf[it]);
        const size_t m = ks.size();
        for (size_t a = 0; a < m; ++a)
            for (size_t b = a + 1; b < m; ++b) {
                if (ks[a] == ks[b]) continue;  // duplicate slot in one kf
                out_w[(size_t)ks[a] * K + ks[b]] += 1;
                out_w[(size_t)ks[b] * K + ks[a]] += 1;
            }
    }
}

// Observation counts per point. out_counts: [P] int32.
void mg_point_obs_count(const int32_t* kf_pt, const uint8_t* kf_valid,
                        int K, int N, int P, int32_t* out_counts) {
    std::memset(out_counts, 0, sizeof(int32_t) * (size_t)P);
    for (int k = 0; k < K; ++k) {
        if (!kf_valid[k]) continue;
        const int32_t* row = kf_pt + (size_t)k * N;
        for (int i = 0; i < N; ++i) {
            int32_t p = row[i];
            if (p >= 0 && p < P) out_counts[p] += 1;
        }
    }
}

// CSR inverted observation index: point -> observing keyframes.
// out_offsets: [P + 1]; out_kf: [total obs] (caller sizes it K * N).
// Rebuilt once per mapping event and cached host-side; per-frame queries
// then touch only the frame's own points (mg_share_from_index).
void mg_invert_obs(const int32_t* kf_pt, const uint8_t* kf_valid,
                   int K, int N, int P,
                   int32_t* out_offsets, int32_t* out_kf) {
    std::vector<int32_t> counts((size_t)P, 0);
    for (int k = 0; k < K; ++k) {
        if (!kf_valid[k]) continue;
        const int32_t* row = kf_pt + (size_t)k * N;
        for (int i = 0; i < N; ++i) {
            int32_t p = row[i];
            if (p >= 0 && p < P) counts[p] += 1;
        }
    }
    out_offsets[0] = 0;
    for (int p = 0; p < P; ++p) out_offsets[p + 1] = out_offsets[p] + counts[p];
    std::vector<int32_t> cursor(out_offsets, out_offsets + P);
    for (int k = 0; k < K; ++k) {
        if (!kf_valid[k]) continue;
        const int32_t* row = kf_pt + (size_t)k * N;
        for (int i = 0; i < N; ++i) {
            int32_t p = row[i];
            if (p >= 0 && p < P) out_kf[cursor[p]++] = k;
        }
    }
}

// ABI stamp: slammap/native.py checks the compiled library exports this
// (and returns this value) before binding; a stale .so is rebuilt.
int32_t mg_abi_version(void) { return 2; }

// CSR inverted observation index carrying both the keyframe AND the
// keypoint slot per observation — the per-point (kf, slot) lists that back
// keyframe culling (LocalMapping.cc:704-790 reads mObservations pairs) and
// point replacement without any [K, N] rescan.
// out_offsets: [P + 1]; out_kf/out_slot: [total obs] (caller sizes K * N).
void mg_invert_obs_slots(const int32_t* kf_pt, const uint8_t* kf_valid,
                         int K, int N, int P,
                         int32_t* out_offsets, int32_t* out_kf,
                         int32_t* out_slot) {
    std::vector<int32_t> counts((size_t)P, 0);
    for (int k = 0; k < K; ++k) {
        if (!kf_valid[k]) continue;
        const int32_t* row = kf_pt + (size_t)k * N;
        for (int i = 0; i < N; ++i) {
            int32_t p = row[i];
            if (p >= 0 && p < P) counts[p] += 1;
        }
    }
    out_offsets[0] = 0;
    for (int p = 0; p < P; ++p) out_offsets[p + 1] = out_offsets[p] + counts[p];
    std::vector<int32_t> cursor(out_offsets, out_offsets + P);
    for (int k = 0; k < K; ++k) {
        if (!kf_valid[k]) continue;
        const int32_t* row = kf_pt + (size_t)k * N;
        for (int i = 0; i < N; ++i) {
            int32_t p = row[i];
            if (p >= 0 && p < P) {
                out_kf[cursor[p]] = k;
                out_slot[cursor[p]] = i;
                ++cursor[p];
            }
        }
    }
}

// share[k] = number of pts (given id list) observed by keyframe k, using
// the CSR index from mg_invert_obs.
void mg_share_from_index(const int32_t* offsets, const int32_t* obs_kf,
                         const int64_t* pt_ids, int n_pts, int K,
                         int32_t* out_share) {
    std::memset(out_share, 0, sizeof(int32_t) * (size_t)K);
    for (int i = 0; i < n_pts; ++i) {
        int64_t p = pt_ids[i];
        for (int32_t o = offsets[p]; o < offsets[p + 1]; ++o)
            out_share[obs_kf[o]] += 1;
    }
}

// Per-keyframe count of observations landing in a point subset (the
// tracker's UpdateLocalKeyFrames seed computation, Tracking.cc:1515):
// in_set: [P] bool mask of the frame's matched points. out_share: [K].
void mg_local_share(const int32_t* kf_pt, const uint8_t* kf_valid,
                    const uint8_t* in_set, int K, int N, int P,
                    int32_t* out_share) {
    std::memset(out_share, 0, sizeof(int32_t) * (size_t)K);
    for (int k = 0; k < K; ++k) {
        if (!kf_valid[k]) continue;
        const int32_t* row = kf_pt + (size_t)k * N;
        int c = 0;
        for (int i = 0; i < N; ++i) {
            int32_t p = row[i];
            if (p >= 0 && p < P && in_set[p]) ++c;
        }
        out_share[k] = c;
    }
}

static inline int hamming256(const uint32_t* a, const uint32_t* b) {
    int d = 0;
    for (int w = 0; w < 8; ++w) d += __builtin_popcount(a[w] ^ b[w]);
    return d;
}

// Per-point statistics update (MapPoint::ComputeDistinctiveDescriptors +
// UpdateNormalAndDepth, /root/reference/src/MapPoint.cc:266-421).
//
// pts:        [n_pts] int64 point ids to refresh
// kf_pt:      [K, N] int32; kf_valid [K] uint8
// kf_desc:    [K, N, 8] uint32 packed descriptors
// kf_octave:  [K, N] int32
// centers:    [K, 3] float camera centers (world)
// pt_pos:     [P, 3] float
// pt_ref_kf:  [P] int32 (updated in place when the ref obs is gone)
// out_desc:   [P, 8] uint32 (only rows in pts written)
// out_normal: [P, 3] float
// out_min/out_max: [P] float
void mg_update_point_stats(
    const int64_t* pts, int n_pts,
    const int32_t* kf_pt, const uint8_t* kf_valid,
    const uint32_t* kf_desc, const int32_t* kf_octave,
    const float* centers, const float* pt_pos,
    int32_t* pt_ref_kf,
    int K, int N, int P,
    float scale_factor, int n_levels,
    uint32_t* out_desc, float* out_normal, float* out_min, float* out_max) {
    // inverted observation lists for just the requested points
    std::vector<int32_t> mark(P, -1);
    for (int i = 0; i < n_pts; ++i) {
        int64_t p = pts[i];
        if (p >= 0 && p < P) mark[p] = i;
    }
    std::vector<std::vector<std::pair<int32_t, int32_t>>> obs(n_pts);
    for (int k = 0; k < K; ++k) {
        if (!kf_valid[k]) continue;
        const int32_t* row = kf_pt + (size_t)k * N;
        for (int s = 0; s < N; ++s) {
            int32_t p = row[s];
            if (p >= 0 && p < P && mark[p] >= 0)
                obs[mark[p]].push_back({k, s});
        }
    }
    const float max_scale = std::pow(scale_factor, (float)(n_levels - 1));
    std::vector<int> dists;
    for (int i = 0; i < n_pts; ++i) {
        int64_t p = pts[i];
        if (p < 0 || p >= P) continue;
        auto& o = obs[i];
        if (o.empty()) continue;
        const int m = (int)o.size();
        // representative descriptor: min median distance to the others
        int best = 0;
        if (m > 1) {
            long best_score = -1;
            std::vector<std::vector<int>> dmat(m, std::vector<int>(m, 0));
            for (int a = 0; a < m; ++a)
                for (int b = a + 1; b < m; ++b) {
                    int d = hamming256(
                        kf_desc + ((size_t)o[a].first * N + o[a].second) * 8,
                        kf_desc + ((size_t)o[b].first * N + o[b].second) * 8);
                    dmat[a][b] = d;
                    dmat[b][a] = d;
                }
            for (int a = 0; a < m; ++a) {
                dists = dmat[a];
                std::sort(dists.begin(), dists.end());
                // median matching numpy: mean of two middles for even m
                long med2 = (m % 2) ? 2L * dists[m / 2]
                                    : (long)dists[m / 2 - 1] + dists[m / 2];
                if (best_score < 0 || med2 < best_score) {
                    best_score = med2;
                    best = a;
                }
            }
        }
        std::memcpy(out_desc + (size_t)p * 8,
                    kf_desc + ((size_t)o[best].first * N + o[best].second) * 8,
                    8 * sizeof(uint32_t));
        // viewing normal
        float nx = 0, ny = 0, nz = 0;
        const float* pw = pt_pos + (size_t)p * 3;
        for (auto& ks : o) {
            const float* c = centers + (size_t)ks.first * 3;
            float rx = pw[0] - c[0], ry = pw[1] - c[1], rz = pw[2] - c[2];
            float nrm = std::sqrt(rx * rx + ry * ry + rz * rz);
            if (nrm < 1e-9f) nrm = 1e-9f;
            nx += rx / nrm; ny += ry / nrm; nz += rz / nrm;
        }
        nx /= m; ny /= m; nz /= m;
        float nn = std::sqrt(nx * nx + ny * ny + nz * nz);
        if (nn < 1e-9f) nn = 1e-9f;
        out_normal[(size_t)p * 3 + 0] = nx / nn;
        out_normal[(size_t)p * 3 + 1] = ny / nn;
        out_normal[(size_t)p * 3 + 2] = nz / nn;
        // scale band from the reference keyframe observation
        int32_t ref = pt_ref_kf[p];
        int ref_idx = -1;
        for (int a = 0; a < m; ++a)
            if (o[a].first == ref) { ref_idx = a; break; }
        if (ref_idx < 0) {
            ref_idx = 0;
            pt_ref_kf[p] = o[0].first;
        }
        const float* c = centers + (size_t)o[ref_idx].first * 3;
        float dx = pw[0] - c[0], dy = pw[1] - c[1], dz = pw[2] - c[2];
        float dist = std::sqrt(dx * dx + dy * dy + dz * dz);
        int level = kf_octave[(size_t)o[ref_idx].first * N + o[ref_idx].second];
        float maxd = dist * std::pow(scale_factor, (float)level);
        out_max[p] = maxd;
        out_min[p] = maxd / max_scale;
    }
}

}  // extern "C"
