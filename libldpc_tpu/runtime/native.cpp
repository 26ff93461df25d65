// Native host runtime for libldpc_tpu.
//
// TPU-native replacement for the host-side jobs the reference does in C++:
// codefile parsing (reference: iostream-based line parsing,
// src/core/sparse.h:92-153) and GF(2) Gaussian elimination (reference:
// forward_list adjacency manipulation, src/core/sparse.h:229-370).  Both are
// reimplemented from scratch for throughput: a branch-light integer scanner
// over a single read of the file, and bit-packed word-parallel elimination.
//
// Exposed over a minimal C ABI consumed via ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// Parse all "row col [val]" integer pairs from a codefile, skipping any line
// that contains ':' (header lines in both reference dialects).  Writes up to
// `cap` pairs into rows/cols; returns the number of pairs, or -1 on I/O
// error, -2 on capacity overflow.
long long ldpc_parse_pairs(const char *path, int32_t *rows, int32_t *cols,
                           long long cap) {
  FILE *f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf(static_cast<size_t>(size) + 1);
  if (size > 0 && fread(buf.data(), 1, static_cast<size_t>(size), f) !=
                      static_cast<size_t>(size)) {
    fclose(f);
    return -1;
  }
  fclose(f);
  buf[static_cast<size_t>(size)] = '\0';

  long long n = 0;
  char *p = buf.data();
  char *end = p + size;
  while (p < end) {
    // find end of line
    char *eol = static_cast<char *>(memchr(p, '\n', static_cast<size_t>(end - p)));
    if (!eol) eol = end;
    // header line?
    bool header = memchr(p, ':', static_cast<size_t>(eol - p)) != nullptr;
    if (!header) {
      // parse first two integers on the line
      char *q = p;
      auto parse_int = [&](int32_t *out) -> bool {
        while (q < eol && (*q == ' ' || *q == '\t' || *q == '\r')) ++q;
        if (q >= eol) return false;
        bool neg = false;
        if (*q == '-') { neg = true; ++q; }
        if (q >= eol || *q < '0' || *q > '9') return false;
        int64_t v = 0;
        while (q < eol && *q >= '0' && *q <= '9') v = v * 10 + (*q++ - '0');
        *out = static_cast<int32_t>(neg ? -v : v);
        return true;
      };
      int32_t r, c;
      if (parse_int(&r) && parse_int(&c)) {
        if (n >= cap) return -2;
        rows[n] = r;
        cols[n] = c;
        ++n;
      }
    }
    p = eol + 1;
  }
  return n;
}

// Rank of a GF(2) matrix given as bit-packed rows: m rows of `words` uint64
// words covering n_cols columns.  Word-parallel Gaussian elimination;
// mutates a local copy.
int ldpc_gf2_rank(const uint64_t *packed, int m, int words, int n_cols) {
  std::vector<uint64_t> a(packed, packed + static_cast<size_t>(m) * words);
  int rank = 0;
  for (int col = 0; col < n_cols && rank < m; ++col) {
    int w = col >> 6;
    uint64_t mask = 1ULL << (col & 63);
    int pivot = -1;
    for (int r = rank; r < m; ++r) {
      if (a[static_cast<size_t>(r) * words + w] & mask) {
        pivot = r;
        break;
      }
    }
    if (pivot < 0) continue;
    if (pivot != rank) {
      for (int j = 0; j < words; ++j)
        std::swap(a[static_cast<size_t>(pivot) * words + j],
                  a[static_cast<size_t>(rank) * words + j]);
    }
    const uint64_t *prow = &a[static_cast<size_t>(rank) * words];
    for (int r = rank + 1; r < m; ++r) {
      uint64_t *row = &a[static_cast<size_t>(r) * words];
      if (row[w] & mask) {
        for (int j = w; j < words; ++j) row[j] ^= prow[j];
      }
    }
    ++rank;
  }
  return rank;
}

}  // extern "C"
