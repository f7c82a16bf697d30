// Native chemistry kernels for deepchem_tpu.
//
// The reference outsources its chemistry hot loops to RDKit (C++); this
// module is the TPU-build analog: the Morgan/ECFP environment iteration
// (deepchem_tpu/chem/fingerprints.py) re-implemented in C++ with
// BIT-IDENTICAL output (same CRC32-of-int32 hashing, same environment
// dedup rule), exposed through a plain C ABI for ctypes.
//
// Build: g++ -O3 -shared -fPIC -o _chemops.so chemops.cpp -lz

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdlib>
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

}  // extern "C"

// ---------------------------------------------------------------------------
// SMILES parser + perception: an exact port of chem/smiles.py::_parse and
// chem/mol.py::finalize (rings, implicit H, Hueckel aromatization,
// hybridization, conjugation), emitting flat per-atom/per-bond property
// arrays for the fast featurization path (hot loop #1).  Any construct the
// port does not handle returns an error and the caller falls back to the
// Python parser — Python is the spec; equivalence is enforced by
// tests/test_native_parse.py over the reference corpora.
// ---------------------------------------------------------------------------

namespace chem {

struct PAtom {
    int z = 0;
    int charge = 0;
    int explicit_hs = -1;    // -1 = compute implicit
    bool aromatic = false;
    int isotope = 0;
    int chirality = 0;       // 0 none, 1 '@', 2 '@@'
    // perceived
    int implicit_hs = 0;
    int degree = 0;
    bool in_ring = false;
    int hyb = 3;             // 0 S,1 SP,2 SP2,3 SP3,4 SP3D,5 SP3D2
};

struct PBond {
    int a1 = 0, a2 = 0;
    int order10 = 10;        // order*10: 10,15,20,30,40
    bool aromatic = false;
    int dir = 0;             // 0 none, 1 '/', 2 '\'
    bool in_ring = false;
    bool conjugated = false;
};

struct PMol {
    std::vector<PAtom> atoms;
    std::vector<PBond> bonds;
    std::vector<std::vector<int>> adj;   // atom -> bond ids

    int add_atom(const PAtom& a) {
        atoms.push_back(a);
        adj.emplace_back();
        return (int)atoms.size() - 1;
    }
    int add_bond(int a1, int a2, int order10, bool arom, int dir) {
        if (a1 == a2) return -1;
        for (int bi : adj[a1])
            if (other(bi, a1) == a2) return -1;    // duplicate
        PBond b; b.a1 = a1; b.a2 = a2; b.order10 = order10;
        b.aromatic = arom; b.dir = dir;
        bonds.push_back(b);
        int idx = (int)bonds.size() - 1;
        adj[a1].push_back(idx);
        adj[a2].push_back(idx);
        return idx;
    }
    int other(int bi, int a) const {
        return bonds[bi].a1 == a ? bonds[bi].a2 : bonds[bi].a1;
    }
};

// periodic table subset (chem/mol.py PERIODIC_TABLE); index = symbol hash
static int symbol_z(const char* s, int len) {
    static const struct { const char* sym; int z; } TAB[] = {
        {"H",1},{"He",2},{"Li",3},{"Be",4},{"B",5},{"C",6},{"N",7},{"O",8},
        {"F",9},{"Ne",10},{"Na",11},{"Mg",12},{"Al",13},{"Si",14},{"P",15},
        {"S",16},{"Cl",17},{"Ar",18},{"K",19},{"Ca",20},{"Sc",21},{"Ti",22},
        {"V",23},{"Cr",24},{"Mn",25},{"Fe",26},{"Co",27},{"Ni",28},{"Cu",29},
        {"Zn",30},{"Ga",31},{"Ge",32},{"As",33},{"Se",34},{"Br",35},{"Kr",36},
        {"Rb",37},{"Sr",38},{"Y",39},{"Zr",40},{"Nb",41},{"Mo",42},{"Tc",43},
        {"Ru",44},{"Rh",45},{"Pd",46},{"Ag",47},{"Cd",48},{"In",49},{"Sn",50},
        {"Sb",51},{"Te",52},{"I",53},{"Xe",54},{"Cs",55},{"Ba",56},{"La",57},
        {"Ce",58},{"Pr",59},{"Nd",60},{"Pm",61},{"Sm",62},{"Eu",63},{"Gd",64},
        {"Tb",65},{"Dy",66},{"Ho",67},{"Er",68},{"Tm",69},{"Yb",70},{"Lu",71},
        {"Hf",72},{"Ta",73},{"W",74},{"Re",75},{"Os",76},{"Ir",77},{"Pt",78},
        {"Au",79},{"Hg",80},{"Tl",81},{"Pb",82},{"Bi",83},{"Po",84},{"At",85},
        {"Rn",86},{"Fr",87},{"Ra",88},{"Ac",89},{"Th",90},{"Pa",91},{"U",92},
        {"*",0},
    };
    for (auto& e : TAB) {
        if ((int)strlen(e.sym) == len && strncmp(e.sym, s, len) == 0)
            return e.z;
    }
    return -1;
}

// DEFAULT_VALENCES (chem/mol.py:52)
static const int* default_valences(int z, int* count) {
    static const int v1[] = {1};      static const int v3[] = {3};
    static const int v4[] = {4};      static const int v35[] = {3, 5};
    static const int v2[] = {2};      static const int v246[] = {2, 4, 6};
    switch (z) {
        case 1: case 9: case 17: case 35: case 53: case 85:
            *count = 1; return v1;
        case 5: *count = 1; return v3;
        case 6: case 14: *count = 1; return v4;
        case 7: case 15: case 33: *count = 2; return v35;
        case 8: *count = 1; return v2;
        case 16: case 34: case 52: *count = 3; return v246;
        default: *count = 0; return nullptr;
    }
}

static bool is_aromatic_organic(char c) {
    return c=='b'||c=='c'||c=='n'||c=='o'||c=='p'||c=='s';
}

// chem/smiles.py::_parse_bracket_atom; returns next index or -1 on error
static int parse_bracket(const char* s, int n, int i, PAtom* out) {
    int j = i;
    while (j < n && s[j] != ']') ++j;
    if (j >= n) return -1;
    int k = i + 1;           // body = s[i+1 .. j)
    const int e = j;
    PAtom a;
    while (k < e && isdigit((unsigned char)s[k]))
        a.isotope = a.isotope * 10 + (s[k++] - '0');
    if (k >= e) return -1;
    if (s[k] == '*') { a.z = 0; ++k; }
    else {
        // two-letter aromatic se/as/te/si
        if (k + 1 < e) {
            char c0 = s[k], c1 = s[k + 1];
            if ((c0=='s'&&(c1=='e'||c1=='i')) || (c0=='a'&&c1=='s') ||
                (c0=='t'&&c1=='e')) {
                char up[3] = {(char)toupper(c0), c1, 0};
                a.z = symbol_z(up, 2);
                a.aromatic = true;
                k += 2;
                goto parsed_symbol;
            }
        }
        if (k + 1 < e && isupper((unsigned char)s[k]) &&
            islower((unsigned char)s[k + 1]) &&
            symbol_z(s + k, 2) >= 0) {
            a.z = symbol_z(s + k, 2);
            k += 2;
        } else if (islower((unsigned char)s[k]) &&
                   is_aromatic_organic(s[k])) {
            char up[2] = {(char)toupper(s[k]), 0};
            a.z = symbol_z(up, 1);
            a.aromatic = true;
            ++k;
        } else if (isupper((unsigned char)s[k])) {
            a.z = symbol_z(s + k, 1);
            ++k;
        } else return -1;
    }
parsed_symbol:
    if (a.z < 0) return -1;
    a.explicit_hs = 0;
    if (k < e && s[k] == '@') {
        if (k + 1 < e && s[k + 1] == '@') { a.chirality = 2; k += 2; }
        else {
            a.chirality = 1; ++k;
            static const char* tags[] = {"TH","AL","SP","TB","OH"};
            for (auto t : tags) {
                int tl = (int)strlen(t);
                if (k + tl <= e && strncmp(s + k, t, tl) == 0) {
                    k += tl;
                    while (k < e && isdigit((unsigned char)s[k])) ++k;
                    break;
                }
            }
        }
    }
    if (k < e && s[k] == 'H') {
        ++k;
        int h = 1;
        if (k < e && isdigit((unsigned char)s[k])) {
            h = 0;
            while (k < e && isdigit((unsigned char)s[k]))
                h = h * 10 + (s[k++] - '0');
        }
        a.explicit_hs = h;
    }
    while (k < e && (s[k] == '+' || s[k] == '-')) {
        int sign = s[k] == '+' ? 1 : -1;
        ++k;
        if (k < e && isdigit((unsigned char)s[k])) {
            int mag = 0;
            while (k < e && isdigit((unsigned char)s[k]))
                mag = mag * 10 + (s[k++] - '0');
            a.charge += sign * mag;
        } else a.charge += sign;
    }
    if (k < e && s[k] == ':') {
        ++k;
        while (k < e && isdigit((unsigned char)s[k])) ++k;
    }
    if (k != e) return -1;
    *out = a;
    return j + 1;
}

// grammar walk (chem/smiles.py::_parse main loop); 0 ok / -1 error
static int parse_smiles(const char* s, PMol* mol) {
    int n = (int)strlen(s);
    while (n > 0 && (s[n-1]==' '||s[n-1]=='\t'||s[n-1]=='\n'||s[n-1]=='\r'))
        --n;
    int start = 0;
    while (start < n && (s[start]==' '||s[start]=='\t')) ++start;
    if (start >= n) return -1;
    std::vector<int> prev_stack = {-1};          // -1 = None
    int pending_order10 = 0;                     // 0 = none
    bool pending_arom = false;
    int pending_dir = 0;
    struct RingSlot { int atom; int order10; int dir; bool open = false; };
    RingSlot rings[100] = {};
    int i = start;
    while (i < n) {
        char c = s[i];
        int bond10 = 0;
        switch (c) {
            case '-': bond10 = 10; break;
            case '=': bond10 = 20; break;
            case '#': bond10 = 30; break;
            case '$': bond10 = 40; break;
            case ':': bond10 = 15; break;
            case '/': case '\\': bond10 = 10; break;
        }
        if (bond10) {
            pending_order10 = bond10;
            pending_arom = (c == ':');
            pending_dir = (c == '/') ? 1 : (c == '\\') ? 2 : 0;
            ++i;
            continue;
        }
        if (c == '.') {
            if (pending_order10) return -1;
            prev_stack.back() = -1;
            ++i;
            continue;
        }
        if (c == '(') { prev_stack.push_back(prev_stack.back()); ++i; continue; }
        if (c == ')') {
            if (prev_stack.size() == 1) return -1;
            prev_stack.pop_back();
            ++i;
            continue;
        }
        if (isdigit((unsigned char)c) || c == '%') {
            int num;
            if (c == '%') {
                if (i + 2 >= n || !isdigit((unsigned char)s[i+1]) ||
                    !isdigit((unsigned char)s[i+2])) return -1;
                num = (s[i+1]-'0') * 10 + (s[i+2]-'0');
                i += 3;
            } else { num = c - '0'; ++i; }
            int cur = prev_stack.back();
            if (cur < 0) return -1;
            if (rings[num].open) {
                int other = rings[num].atom;
                int order10 = pending_order10 ? pending_order10
                                              : rings[num].order10;
                bool arom = pending_arom;
                if (order10 == 0) {
                    if (mol->atoms[cur].aromatic &&
                        mol->atoms[other].aromatic) {
                        order10 = 15; arom = true;
                    } else order10 = 10;
                } else if (order10 == 15) arom = true;
                int sdir;
                if (pending_dir)                 // closure mark: flip
                    sdir = pending_dir == 1 ? 2 : 1;
                else sdir = rings[num].dir;
                if (mol->add_bond(other, cur, order10, arom, sdir) < 0)
                    return -1;
                rings[num].open = false;
            } else {
                rings[num] = {cur, pending_order10, pending_dir, true};
            }
            pending_order10 = 0; pending_arom = false; pending_dir = 0;
            continue;
        }
        // atom
        PAtom atom;
        if (c == '[') {
            int ni = parse_bracket(s, n, i, &atom);
            if (ni < 0) return -1;
            i = ni;
        } else if (i + 1 < n &&
                   ((c=='C'&&s[i+1]=='l') || (c=='B'&&s[i+1]=='r'))) {
            atom.z = (c == 'C') ? 17 : 35;
            i += 2;
        } else if (c=='B'||c=='C'||c=='N'||c=='O'||c=='P'||c=='S'||
                   c=='F'||c=='I') {
            char up[2] = {c, 0};
            atom.z = symbol_z(up, 1);
            ++i;
        } else if (c == '*') {
            atom.z = 0;
            ++i;
        } else if (is_aromatic_organic(c)) {
            char up[2] = {(char)toupper(c), 0};
            atom.z = symbol_z(up, 1);
            atom.aromatic = true;
            ++i;
        } else return -1;
        int idx = mol->add_atom(atom);
        int cur = prev_stack.back();
        if (cur >= 0) {
            int order10 = pending_order10;
            bool arom = pending_arom;
            if (order10 == 0) {
                if (mol->atoms[cur].aromatic && mol->atoms[idx].aromatic) {
                    order10 = 15; arom = true;
                } else order10 = 10;
            } else if (order10 == 15) arom = true;
            if (mol->add_bond(cur, idx, order10, arom, pending_dir) < 0)
                return -1;
        }
        pending_order10 = 0; pending_arom = false; pending_dir = 0;
        prev_stack.back() = idx;
    }
    if (prev_stack.size() != 1) return -1;
    for (int r = 0; r < 100; ++r)
        if (rings[r].open) return -1;
    return mol->atoms.empty() ? -1 : 0;
}

// chem/mol.py::_perceive_rings — Tarjan bridges, iterative
static void perceive_rings(PMol* m) {
    int n = (int)m->atoms.size();
    std::vector<char> visited(n, 0);
    std::vector<int> disc(n, 0), low(n, 0);
    int timer = 1;
    std::vector<char> is_bridge(m->bonds.size(), 0);
    struct Frame { int u; int parent_bond; size_t it; };
    std::vector<Frame> stack;
    for (int root = 0; root < n; ++root) {
        if (visited[root]) continue;
        stack.push_back({root, -1, 0});
        visited[root] = 1;
        disc[root] = low[root] = timer++;
        while (!stack.empty()) {
            Frame& f = stack.back();
            bool advanced = false;
            while (f.it < m->adj[f.u].size()) {
                int bi = m->adj[f.u][f.it++];
                if (bi == f.parent_bond) continue;
                int v = m->other(bi, f.u);
                if (!visited[v]) {
                    visited[v] = 1;
                    disc[v] = low[v] = timer++;
                    stack.push_back({v, bi, 0});
                    advanced = true;
                    break;
                } else {
                    low[f.u] = std::min(low[f.u], disc[v]);
                }
            }
            if (!advanced) {
                int u = stack.back().u;
                int pb = stack.back().parent_bond;
                stack.pop_back();
                if (!stack.empty()) {
                    int pu = stack.back().u;
                    low[pu] = std::min(low[pu], low[u]);
                    if (low[u] > disc[pu]) is_bridge[pb] = 1;
                }
            }
        }
    }
    for (size_t b = 0; b < m->bonds.size(); ++b)
        m->bonds[b].in_ring = !is_bridge[b];
    for (int a = 0; a < n; ++a) {
        m->atoms[a].in_ring = false;
        for (int bi : m->adj[a])
            if (m->bonds[bi].in_ring) { m->atoms[a].in_ring = true; break; }
    }
}

// chem/mol.py::rings() — per ring-bond BFS shortest cycle, dedup
static std::vector<std::vector<int>> small_rings(const PMol* m) {
    int n = (int)m->atoms.size();
    std::map<std::vector<int>, std::pair<size_t, std::vector<int>>> found;
    size_t order_counter = 0;
    std::vector<int> prev_atom(n), prev_seen(n, -1);
    std::vector<int> queue;
    for (size_t bidx = 0; bidx < m->bonds.size(); ++bidx) {
        const PBond& bond = m->bonds[bidx];
        if (!bond.in_ring) continue;
        int src = bond.a1, dst = bond.a2;
        int stamp = (int)bidx;
        prev_seen[src] = stamp;
        prev_atom[src] = -1;
        queue.clear();
        queue.push_back(src);
        size_t head = 0;
        bool reached = false;
        while (head < queue.size()) {
            int u = queue[head++];
            if (u == dst) { reached = true; break; }
            for (int bi : m->adj[u]) {
                if (bi == (int)bidx) continue;
                if (!m->bonds[bi].in_ring) continue;
                int v = m->other(bi, u);
                if (prev_seen[v] != stamp) {
                    prev_seen[v] = stamp;
                    prev_atom[v] = u;
                    queue.push_back(v);
                }
            }
        }
        if (!reached) continue;
        std::vector<int> path;
        for (int u = dst; u != -1; u = prev_atom[u]) path.push_back(u);
        std::vector<int> key(path);
        std::sort(key.begin(), key.end());
        auto it = found.find(key);
        if (it == found.end())
            found.emplace(std::move(key),
                          std::make_pair(order_counter++, path));
        else if (path.size() < it->second.second.size())
            it->second.second = path;
    }
    // sorted(values, key=len) — Python's sort is stable on insertion order
    std::vector<std::pair<size_t, std::vector<int>>> items;
    for (auto& kv : found) items.push_back(kv.second);
    std::sort(items.begin(), items.end(),
              [](const auto& a, const auto& b) {
                  if (a.second.size() != b.second.size())
                      return a.second.size() < b.second.size();
                  return a.first < b.first;
              });
    std::vector<std::vector<int>> out;
    out.reserve(items.size());
    for (auto& it : items) out.push_back(std::move(it.second));
    return out;
}

// chem/mol.py::_perceive_hydrogens
static void perceive_hydrogens(PMol* m) {
    for (size_t ai = 0; ai < m->atoms.size(); ++ai) {
        PAtom& a = m->atoms[ai];
        int deg = (int)m->adj[ai].size();
        a.degree = deg;
        double bond_sum = 0.0;
        for (int bi : m->adj[ai]) {
            double o = m->bonds[bi].order10 / 10.0;
            if (m->bonds[bi].order10 == 15) {
                if (a.z == 8 || a.z == 16 || (a.z == 7 && deg == 3))
                    o = 1.0;
            }
            bond_sum += o;
        }
        if (a.explicit_hs >= 0) { a.implicit_hs = 0; continue; }
        int order = (int)ceil(bond_sum - 1e-9);
        int nv;
        const int* vals = default_valences(a.z, &nv);
        if (!vals) { a.implicit_hs = 0; continue; }
        int shift;
        if (a.z == 7 || a.z == 15 || a.z == 8 || a.z == 16)
            shift = a.charge;
        else if (a.z == 5) shift = -a.charge;
        else shift = -abs(a.charge);
        int hs = 0;
        for (int k = 0; k < nv; ++k) {
            int cap = vals[k] + shift;
            if (cap >= order) { hs = cap - order; break; }
        }
        a.implicit_hs = hs > 0 ? hs : 0;   // radicals always 0 from SMILES
    }
}

static inline int total_hs(const PAtom& a) {
    return a.explicit_hs >= 0 ? a.explicit_hs : a.implicit_hs;
}

// chem/mol.py::_perceive_aromaticity (Hueckel 4n+2 on kekulé rings)
static void perceive_aromaticity(PMol* m,
                                 const std::vector<std::vector<int>>& all_rings) {
    std::vector<const std::vector<int>*> rings;
    for (auto& r : all_rings)
        if (r.size() >= 5 && r.size() <= 7) rings.push_back(&r);
    if (rings.empty()) return;
    int n = (int)m->atoms.size();
    bool changed = true;
    std::vector<int> dbl_partner(n);
    std::vector<int> dbl_count(n);
    auto get_bond = [&](int a1, int a2) -> int {
        for (int bi : m->adj[a1])
            if (m->other(bi, a1) == a2) return bi;
        return -1;
    };
    while (changed) {
        changed = false;
        std::fill(dbl_partner.begin(), dbl_partner.end(), -1);
        std::fill(dbl_count.begin(), dbl_count.end(), 0);
        for (auto& b : m->bonds) {
            if (b.order10 == 20) {
                if (dbl_partner[b.a1] < 0) dbl_partner[b.a1] = b.a2;
                dbl_count[b.a1]++;
                if (dbl_partner[b.a2] < 0) dbl_partner[b.a2] = b.a1;
                dbl_count[b.a2]++;
            }
        }
        for (auto* ring_p : rings) {
            const std::vector<int>& ring = *ring_p;
            int rl = (int)ring.size();
            std::vector<int> bonds(rl);
            bool missing = false, all_arom = true;
            std::vector<char> in_rset(n, 0);
            for (int x : ring) in_rset[x] = 1;
            for (int k = 0; k < rl; ++k) {
                bonds[k] = get_bond(ring[k], ring[(k + 1) % rl]);
                if (bonds[k] < 0) { missing = true; break; }
                if (m->bonds[bonds[k]].order10 != 15) all_arom = false;
            }
            if (missing || all_arom) continue;
            int pi = 0;
            std::vector<int> donors;
            bool ok = true;
            for (int iat : ring) {
                const PAtom& a = m->atoms[iat];
                if (dbl_count[iat] > 1) { ok = false; break; }
                if (dbl_count[iat] == 1) {
                    int p = dbl_partner[iat];
                    int pb = get_bond(iat, p);
                    if (in_rset[p] || (pb >= 0 && m->bonds[pb].in_ring)) {
                        pi += 1;
                    } else if ((m->atoms[p].z == 7 || m->atoms[p].z == 8 ||
                                m->atoms[p].z == 16 || m->atoms[p].z == 34)
                               && !m->atoms[p].in_ring) {
                        // carbonyl-type exocyclic: contributes 0
                    } else { ok = false; break; }
                } else if (a.aromatic) {
                    pi += 1;
                } else if ((a.z == 7 || a.z == 15) && a.charge == 0 &&
                           a.degree + total_hs(a) <= 3) {
                    pi += 2;
                    donors.push_back(iat);
                } else if ((a.z == 8 || a.z == 16 || a.z == 34) &&
                           a.charge == 0 && a.degree == 2) {
                    pi += 2;
                } else if (a.z == 6 && a.charge == -1) {
                    pi += 2;
                    donors.push_back(iat);
                } else if (a.z == 6 && a.charge == 1) {
                    // tropylium: 0
                } else { ok = false; break; }
            }
            if (!ok || pi % 4 != 2) continue;
            for (int d : donors) {
                if (m->atoms[d].explicit_hs < 0)
                    m->atoms[d].explicit_hs = total_hs(m->atoms[d]);
            }
            for (int iat : ring) m->atoms[iat].aromatic = true;
            for (int bi : bonds) {
                m->bonds[bi].order10 = 15;
                m->bonds[bi].aromatic = true;
            }
            changed = true;
        }
    }
}

// chem/mol.py::_perceive_hybridization + _perceive_conjugation
static void perceive_hyb_conj(PMol* m) {
    for (size_t ai = 0; ai < m->atoms.size(); ++ai) {
        PAtom& a = m->atoms[ai];
        if (a.aromatic) { a.hyb = 2; continue; }
        int nd = 0, nt = 0;
        for (int bi : m->adj[ai]) {
            if (m->bonds[bi].order10 == 20) ++nd;
            if (m->bonds[bi].order10 == 30) ++nt;
        }
        int heavy = a.degree + total_hs(a);
        if (nt || nd >= 2) a.hyb = 1;
        else if (nd == 1) a.hyb = 2;
        else if (heavy > 6) a.hyb = 5;
        else if (heavy > 4) a.hyb = 4;
        else if (heavy <= 1 && a.degree <= 1 && a.z == 1) a.hyb = 0;
        else a.hyb = 3;
    }
    for (auto& b : m->bonds) {
        auto pi_capable = [&](const PAtom& a) {
            return a.aromatic || a.hyb == 1 || a.hyb == 2;
        };
        b.conjugated = b.aromatic ||
            (pi_capable(m->atoms[b.a1]) && pi_capable(m->atoms[b.a2]));
    }
}

}  // namespace chem

extern "C" {

// Parse one SMILES and emit perceived properties.
//   atom_props [max_atoms, 10]: z, charge, degree, implicit_valence,
//     total_hs, hyb, aromatic, chirality, radicals, in_ring
//   bond_props [max_bonds, 6]: a1, a2, order10, aromatic, conjugated,
//     in_ring
// Returns 0 on success, -1 parse error, -2 capacity exceeded.
int parse_smiles_props(const char* smi, int max_atoms, int max_bonds,
                       int32_t* n_atoms, int32_t* n_bonds,
                       int32_t* atom_props, int32_t* bond_props) {
    chem::PMol mol;
    if (chem::parse_smiles(smi, &mol) != 0) return -1;
    if ((int)mol.atoms.size() > max_atoms ||
        (int)mol.bonds.size() > max_bonds) return -2;
    chem::perceive_rings(&mol);
    chem::perceive_hydrogens(&mol);
    auto rings = chem::small_rings(&mol);
    chem::perceive_aromaticity(&mol, rings);
    chem::perceive_hyb_conj(&mol);
    *n_atoms = (int32_t)mol.atoms.size();
    *n_bonds = (int32_t)mol.bonds.size();
    for (size_t i = 0; i < mol.atoms.size(); ++i) {
        const chem::PAtom& a = mol.atoms[i];
        int32_t* row = atom_props + i * 10;
        row[0] = a.z;
        row[1] = a.charge;
        row[2] = a.degree;
        row[3] = a.explicit_hs >= 0 ? 0 : a.implicit_hs;
        row[4] = chem::total_hs(a);
        row[5] = a.hyb;
        row[6] = a.aromatic ? 1 : 0;
        row[7] = a.chirality;
        row[8] = 0;                      // radicals: none from SMILES
        row[9] = a.in_ring ? 1 : 0;
    }
    for (size_t b = 0; b < mol.bonds.size(); ++b) {
        const chem::PBond& bd = mol.bonds[b];
        int32_t* row = bond_props + b * 6;
        row[0] = bd.a1;
        row[1] = bd.a2;
        row[2] = bd.order10;
        row[3] = bd.aromatic ? 1 : 0;
        row[4] = bd.conjugated ? 1 : 0;
        row[5] = bd.in_ring ? 1 : 0;
    }
    return 0;
}

}  // extern "C"

extern "C" {

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
