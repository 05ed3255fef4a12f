// Native runtime support library for lidp_tpu.
//
// The reference's runtime (I/O, topology, RNG streams) is C++
// (read_data.cpp, special.cpp, random_park.cpp); these are the TPU-native
// framework's equivalents for the host-side paths that are hot at
// 100k+ atoms: data-file section parsing, 1-2/1-3/1-4 special-list
// construction (graph BFS), and the sequential Park-Miller velocity stream.
// Exposed with a plain C ABI for ctypes (pybind11 is not available in this
// image); lidp_tpu.native falls back to pure Python when the library is
// missing.
//
// Build: cc -O3 -shared -fPIC lidp_native.cpp -o liblidp_native.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// ------------------------------------------------------------- dump frames
// Format nrows x ncols values as LAMMPS dump text rows ("%d"/"%g" per
// column, space-separated, newline-terminated).  vals is row-major double;
// is_int marks integer columns.  Returns bytes written, or -1 if cap was
// too small.  This is the hot host-side path when dumping every few steps.
long format_dump_rows(long nrows, int ncols, const double* vals,
                      const uint8_t* is_int, char* out, long cap) {
    long w = 0;
    char buf[64];
    for (long r = 0; r < nrows; ++r) {
        for (int c = 0; c < ncols; ++c) {
            double v = vals[r * ncols + c];
            int len;
            if (is_int[c]) {
                len = snprintf(buf, sizeof(buf), "%lld", (long long)v);
            } else {
                len = snprintf(buf, sizeof(buf), "%g", v);
            }
            if (w + len + 2 > cap) return -1;
            memcpy(out + w, buf, len);
            w += len;
            out[w++] = (c == ncols - 1) ? '\n' : ' ';
        }
    }
    return w;
}

// ---------------------------------------------------------------- special lists
// bonds: nbonds pairs of 1-based atom ids.  idx_out: natoms*scap int32
// prefilled by caller; lvl_out: natoms*scap int8.  Returns max special count
// (so the caller can validate scap), or -1 on overflow.
int build_special_lists(int natoms, int nbonds, const int64_t* bonds,
                        int scap, int32_t* idx_out, int8_t* lvl_out) {
    std::vector<std::vector<int>> adj(natoms);
    for (int b = 0; b < nbonds; ++b) {
        int i = (int)bonds[2 * b] - 1;
        int j = (int)bonds[2 * b + 1] - 1;
        if (i < 0 || j < 0 || i >= natoms || j >= natoms) return -2;
        adj[i].push_back(j);
        adj[j].push_back(i);
    }
    std::vector<int8_t> mark(natoms, 0);
    std::vector<int> touched;
    int maxs = 0;
    for (int i = 0; i < natoms; ++i) {
        touched.clear();
        mark[i] = 4;  // self sentinel
        touched.push_back(i);
        // 1-2
        for (int j : adj[i]) if (!mark[j]) { mark[j] = 1; touched.push_back(j); }
        // 1-3: neighbors of 1-2 not already marked
        size_t n12_end = touched.size();
        for (size_t t = 1; t < n12_end; ++t)
            for (int k : adj[touched[t]])
                if (!mark[k]) { mark[k] = 2; touched.push_back(k); }
        // 1-4
        size_t n13_end = touched.size();
        for (size_t t = n12_end; t < n13_end; ++t)
            for (int k : adj[touched[t]])
                if (!mark[k]) { mark[k] = 3; touched.push_back(k); }
        int cnt = (int)touched.size() - 1;
        if (cnt > maxs) maxs = cnt;
        if (cnt <= scap) {
            int32_t* row = idx_out + (int64_t)i * scap;
            int8_t* lrow = lvl_out + (int64_t)i * scap;
            int k = 0;
            // closer relation wins; emit in level order (1-2, 1-3, 1-4),
            // sorted within level for determinism
            for (int8_t level = 1; level <= 3; ++level) {
                std::vector<int> grp;
                for (size_t t = 1; t < touched.size(); ++t)
                    if (mark[touched[t]] == level) grp.push_back(touched[t]);
                std::sort(grp.begin(), grp.end());
                for (int j : grp) { row[k] = j; lrow[k] = level; ++k; }
            }
        }
        for (int t : touched) mark[t] = 0;
    }
    return maxs;
}

// ------------------------------------------------------------- Atoms parsing
// Parse the rows of an Atoms section (atom_style full:
// id mol type q x y z [ix iy iz]).  buf is the raw section text.
// Returns number of rows parsed (should equal natoms) or -1 on error.
int parse_atoms_full(const char* buf, int64_t len, int natoms,
                     double* x, double* q, int32_t* type, int32_t* mol,
                     int32_t* image) {
    const char* p = buf;
    const char* end = buf + len;
    int count = 0;
    while (p < end && count < natoms + 8) {
        // skip whitespace / blank lines
        while (p < end && (*p == '\n' || *p == '\r' || *p == ' ' || *p == '\t'))
            ++p;
        if (p >= end) break;
        char* next;
        long id = strtol(p, &next, 10);
        if (next == p) {  // not a number: skip line (e.g. trailing comment)
            while (p < end && *p != '\n') ++p;
            continue;
        }
        p = next;
        long m = strtol(p, &next, 10); p = next;
        long t = strtol(p, &next, 10); p = next;
        double qq = strtod(p, &next); p = next;
        double xx = strtod(p, &next); p = next;
        double yy = strtod(p, &next); p = next;
        double zz = strtod(p, &next); p = next;
        long ix = 0, iy = 0, iz = 0;
        // optional image flags before newline/comment
        while (p < end && (*p == ' ' || *p == '\t')) ++p;
        if (p < end && (*p == '-' || (*p >= '0' && *p <= '9'))) {
            ix = strtol(p, &next, 10); p = next;
            iy = strtol(p, &next, 10); p = next;
            iz = strtol(p, &next, 10); p = next;
        }
        while (p < end && *p != '\n') ++p;  // rest of line (comments)
        if (id < 1 || id > natoms) return -1;
        int64_t k = id - 1;
        mol[k] = (int32_t)m;
        type[k] = (int32_t)t;
        q[k] = qq;
        x[3 * k] = xx; x[3 * k + 1] = yy; x[3 * k + 2] = zz;
        image[3 * k] = (int32_t)ix; image[3 * k + 1] = (int32_t)iy;
        image[3 * k + 2] = (int32_t)iz;
        ++count;
    }
    return count;
}

// ------------------------------------------------- Park-Miller velocity stream
// velocity create ... loop all (velocity.cpp:280-305): one sequential RanPark
// stream over global atom ids; gaussian Box-Muller with save state.
static int64_t pm_seed;
static int pm_save;
static double pm_second;

static double pm_uniform() {
    const int64_t IA = 16807, IM = 2147483647, IQ = 127773, IR = 2836;
    int64_t k = pm_seed / IQ;
    pm_seed = IA * (pm_seed - k * IQ) - IR * k;
    if (pm_seed < 0) pm_seed += IM;
    // multiply by the precomputed reciprocal, exactly like the reference's
    // AM*seed (random_park.cpp:47) — direct division differs by 1 ulp
    const double AM = 1.0 / 2147483647.0;
    return AM * (double)pm_seed;
}

static double pm_gaussian() {
    if (!pm_save) {
        double v1, v2, rsq;
        do {
            v1 = 2.0 * pm_uniform() - 1.0;
            v2 = 2.0 * pm_uniform() - 1.0;
            rsq = v1 * v1 + v2 * v2;
        } while (rsq >= 1.0 || rsq == 0.0);
        double fac = sqrt(-2.0 * log(rsq) / rsq);
        pm_second = v1 * fac;
        pm_save = 1;
        return v2 * fac;
    }
    pm_save = 0;
    return pm_second;
}

// dist: 0 = uniform (-0.5..0.5), 1 = gaussian. out: natoms*3 raw draws
// (mass scaling applied by the caller).
void velocity_stream(int seed, int natoms, int dist, double* out) {
    pm_seed = seed;
    pm_save = 0;
    for (int i = 0; i < natoms; ++i) {
        if (dist == 0) {
            out[3 * i] = pm_uniform() - 0.5;
            out[3 * i + 1] = pm_uniform() - 0.5;
            out[3 * i + 2] = pm_uniform() - 0.5;
        } else {
            out[3 * i] = pm_gaussian();
            out[3 * i + 1] = pm_gaussian();
            out[3 * i + 2] = pm_gaussian();
        }
    }
}

}  // extern "C"
