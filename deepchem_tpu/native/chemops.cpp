// Native chemistry kernels for deepchem_tpu.
//
// The reference outsources its chemistry hot loops to RDKit (C++); this
// module is the TPU-build analog: the Morgan/ECFP environment iteration
// (deepchem_tpu/chem/fingerprints.py) re-implemented in C++ with
// BIT-IDENTICAL output (same CRC32-of-int32 hashing, same environment
// dedup rule), exposed through a plain C ABI for ctypes.
//
// Build: g++ -O3 -shared -fPIC -o _chemops.so chemops.cpp -lz

#include <cstdint>
#include <cstring>
#include <map>
#include <set>
#include <unordered_map>
#include <vector>
#include <algorithm>
#include <zlib.h>

namespace {

// CRC32 of a little-endian int32 sequence, each value masked to 31 bits —
// identical to fingerprints.py::_hash_ints.
uint32_t hash_ints(const std::vector<int64_t>& ints) {
    std::vector<unsigned char> buf(ints.size() * 4);
    for (size_t k = 0; k < ints.size(); ++k) {
        uint32_t v = (uint32_t)(ints[k] & 0x7fffffffLL);
        buf[4 * k + 0] = v & 0xff;
        buf[4 * k + 1] = (v >> 8) & 0xff;
        buf[4 * k + 2] = (v >> 16) & 0xff;
        buf[4 * k + 3] = (v >> 24) & 0xff;
    }
    return (uint32_t)crc32(0L, buf.data(), (uInt)buf.size());
}

}  // namespace

extern "C" {

// Folded Morgan fingerprint.
//  invs:        [n_atoms] initial atom invariants (uint32, host-computed)
//  bond_a1/a2:  [n_bonds] endpoints
//  order_code:  [n_bonds] int(round(order*2)), or all-1 when bond types off
//  out:         [n_bits] float32, zeroed by caller
// Returns number of distinct emitted features.
int morgan_fold(int n_atoms, const uint32_t* invs, int n_bonds,
                const int32_t* bond_a1, const int32_t* bond_a2,
                const int32_t* order_code, int radius, int n_bits,
                int counts, float* out) {
    if (n_atoms <= 0 || n_bits <= 0) return 0;
    // adjacency: per atom, list of (bond index, neighbor)
    std::vector<std::vector<std::pair<int, int>>> adj(n_atoms);
    for (int b = 0; b < n_bonds; ++b) {
        adj[bond_a1[b]].push_back({b, bond_a2[b]});
        adj[bond_a2[b]].push_back({b, bond_a1[b]});
    }
    std::vector<uint32_t> current(invs, invs + n_atoms);
    std::vector<std::set<int>> env_bonds(n_atoms);
    // dedup: environment bond-set -> seen
    std::map<std::vector<int>, uint32_t> seen_envs;
    std::unordered_map<uint32_t, int> features;

    auto emit = [&](uint32_t h, const std::set<int>& bonds) {
        if (!bonds.empty()) {
            std::vector<int> key(bonds.begin(), bonds.end());
            auto it = seen_envs.find(key);
            if (it != seen_envs.end()) return;
            seen_envs.emplace(std::move(key), h);
        }
        features[h] += 1;
    };

    for (int i = 0; i < n_atoms; ++i) emit(current[i], {});

    for (int r = 1; r <= radius; ++r) {
        std::vector<uint32_t> new_invs(n_atoms);
        std::vector<std::set<int>> new_envs(n_atoms);
        for (int i = 0; i < n_atoms; ++i) {
            std::vector<std::pair<int64_t, int64_t>> nbrs;
            std::set<int> env = env_bonds[i];
            for (auto& [bidx, j] : adj[i]) {
                nbrs.push_back({(int64_t)order_code[bidx],
                                (int64_t)current[j]});
                env.insert(bidx);
                env.insert(env_bonds[j].begin(), env_bonds[j].end());
            }
            std::sort(nbrs.begin(), nbrs.end());
            std::vector<int64_t> flat;
            flat.reserve(2 + 2 * nbrs.size());
            flat.push_back(r);
            flat.push_back((int64_t)current[i]);
            for (auto& [oc, inv] : nbrs) {
                flat.push_back(oc);
                flat.push_back(inv);
            }
            new_invs[i] = hash_ints(flat);
            new_envs[i] = std::move(env);
        }
        for (int i = 0; i < n_atoms; ++i) {
            if (new_envs[i].size() > env_bonds[i].size())
                emit(new_invs[i], new_envs[i]);
        }
        current = std::move(new_invs);
        env_bonds = std::move(new_envs);
    }

    for (auto& [h, c] : features) {
        int idx = (int)(h % (uint32_t)n_bits);
        if (counts) out[idx] += (float)c;
        else out[idx] = 1.0f;
    }
    return (int)features.size();
}

// Dense Tanimoto similarity matrix between two binary fingerprint sets
// packed as uint64 words: A [na, n_words], B [nb, n_words] -> out [na, nb].
void tanimoto_matrix(const uint64_t* A, int na, const uint64_t* B, int nb,
                     int n_words, float* out) {
    std::vector<int> popA(na);
    for (int i = 0; i < na; ++i) {
        int p = 0;
        for (int w = 0; w < n_words; ++w)
            p += __builtin_popcountll(A[(size_t)i * n_words + w]);
        popA[i] = p;
    }
    std::vector<int> popB(nb);
    for (int j = 0; j < nb; ++j) {
        int p = 0;
        for (int w = 0; w < n_words; ++w)
            p += __builtin_popcountll(B[(size_t)j * n_words + w]);
        popB[j] = p;
    }
    for (int i = 0; i < na; ++i) {
        const uint64_t* ai = A + (size_t)i * n_words;
        for (int j = 0; j < nb; ++j) {
            const uint64_t* bj = B + (size_t)j * n_words;
            int inter = 0;
            for (int w = 0; w < n_words; ++w)
                inter += __builtin_popcountll(ai[w] & bj[w]);
            int uni = popA[i] + popB[j] - inter;
            out[(size_t)i * nb + j] = uni > 0 ? (float)inter / uni : 0.0f;
        }
    }
}

}  // extern "C"
