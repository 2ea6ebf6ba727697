// Native IO + host-side preprocessing for reflexiv_tpu.
//
// Replaces the reference's JVM-side ingest stack (Spark text reader +
// hadoop-4mc splittable codec, ReflexivDataFrameCounter.java:160-176) and the
// shelled-out `flash` pair merger (ReflexivDataFrameDecompresser.java:475-542)
// with an in-process C++ library bound via ctypes: gzip FASTQ/FASTA decode
// straight into 2-bit base-code matrices ready for device upload, and an
// O(P*L^2) pair overlap merge that was too slow in Python.
//
// Build: make -C native   (g++ -O3 -shared, links zlib)

#include <zlib.h>

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// A=0 C=1 G=2 T=3; everything else (incl. N) maps to T, matching the
// reference's nucleotideValue (ReflexivDSMain.java:4010-4022).
struct CodeTable {
  uint8_t t[256];
  CodeTable() {
    std::memset(t, 3, sizeof(t));
    t['A'] = t['a'] = 0;
    t['C'] = t['c'] = 1;
    t['G'] = t['g'] = 2;
    t['T'] = t['t'] = 3;
  }
};
const CodeTable kCodes;

constexpr int kLineMax = 1 << 20;

bool read_line(gzFile f, std::vector<char>* buf) {
  buf->clear();
  char chunk[65536];
  while (true) {
    if (gzgets(f, chunk, sizeof(chunk)) == nullptr) return !buf->empty();
    size_t n = std::strlen(chunk);
    buf->insert(buf->end(), chunk, chunk + n);
    if (n > 0 && chunk[n - 1] == '\n') {
      buf->pop_back();
      if (!buf->empty() && buf->back() == '\r') buf->pop_back();
      return true;
    }
    if ((int)buf->size() > kLineMax) return true;  // defensive cap
  }
}

}  // namespace

extern "C" {

// First pass: count records and the maximum sequence length.
// fmt: 0 = FASTQ (4-line), 1 = FASTA. Returns 0 on success, <0 on error.
int rfx_scan(const char* path, int fmt, int64_t* n_reads, int64_t* max_len) {
  gzFile f = gzopen(path, "rb");
  if (f == nullptr) return -1;
  std::vector<char> line;
  int64_t n = 0, mx = 0;
  if (fmt == 0) {
    int64_t ln = 0;
    while (read_line(f, &line)) {
      if (ln % 4 == 1) {
        ++n;
        if ((int64_t)line.size() > mx) mx = (int64_t)line.size();
      }
      ++ln;
    }
  } else {
    int64_t cur = 0;
    bool in_seq = false;
    while (read_line(f, &line)) {
      if (!line.empty() && line[0] == '>') {
        if (in_seq) {
          ++n;
          if (cur > mx) mx = cur;
        }
        in_seq = true;
        cur = 0;
      } else {
        cur += (int64_t)line.size();
      }
    }
    if (in_seq) {
      ++n;
      if (cur > mx) mx = cur;
    }
  }
  gzclose(f);
  *n_reads = n;
  *max_len = mx;
  return 0;
}

// Second pass: decode into codes (n_reads x stride, row-major, pad 0) and
// lens. Sequences longer than stride are truncated to stride.
// Returns number of records decoded, <0 on error.
int64_t rfx_load(const char* path, int fmt, uint8_t* codes, int32_t* lens,
                 int64_t cap_reads, int64_t stride) {
  gzFile f = gzopen(path, "rb");
  if (f == nullptr) return -1;
  std::vector<char> line;
  int64_t n = 0;

  auto emit = [&](const char* s, int64_t len) {
    if (n >= cap_reads) return;
    if (len > stride) len = stride;
    uint8_t* row = codes + n * stride;
    for (int64_t i = 0; i < len; ++i) row[i] = kCodes.t[(uint8_t)s[i]];
    lens[n] = (int32_t)len;
    ++n;
  };

  if (fmt == 0) {
    int64_t ln = 0;
    while (read_line(f, &line)) {
      if (ln % 4 == 1) emit(line.data(), (int64_t)line.size());
      ++ln;
    }
  } else {
    std::vector<char> seq;
    bool in_seq = false;
    while (read_line(f, &line)) {
      if (!line.empty() && line[0] == '>') {
        if (in_seq) emit(seq.data(), (int64_t)seq.size());
        in_seq = true;
        seq.clear();
      } else {
        seq.insert(seq.end(), line.begin(), line.end());
      }
    }
    if (in_seq) emit(seq.data(), (int64_t)seq.size());
  }
  gzclose(f);
  return n;
}

// ---------------------------------------------------------------------------
// Splittable multithreaded ingest for PLAIN (uncompressed) FASTQ — the
// hadoop-4mc analog (splittable parallel file reads,
// ReflexivDataFrameCounter.java:160-176): byte-range splits aligned to
// record boundaries, each split parsed by its own thread. Gzip streams are
// not splittable; multi-file parallelism covers those (see native.py).
//
// Record-boundary alignment: a line L is a FASTQ header iff L starts with
// '@' and the line two below starts with '+' (a quality line may start with
// '@', but then two lines below is a sequence line, never '+').

// Compute nsplits aligned start offsets for `path` (plain FASTQ).
// aligned[] receives nsplits+1 offsets (last = file size).
// Returns 0 on success, <0 on error.
namespace {

// A chunk returned by fgets completes its line iff it ends in '\n', or it
// is an EOF-terminated final line (fgets stopped before filling the
// buffer). Lines longer than the buffer span several chunks.
inline bool chunk_completes_line(const char* buf, size_t len, size_t cap) {
  return (len > 0 && buf[len - 1] == '\n') || (len + 1 < cap);
}

}  // namespace

int rfx_fastq_splits(const char* path, int64_t nsplits, int64_t* aligned) {
  FILE* f = std::fopen(path, "rb");
  if (f == nullptr) return -1;
  std::fseek(f, 0, SEEK_END);
  int64_t size = std::ftell(f);
  std::vector<char> buf(1 << 20);
  for (int64_t i = 0; i < nsplits; ++i) {
    int64_t target = size * i / nsplits;
    if (i == 0) {
      aligned[0] = 0;
      continue;
    }
    std::fseek(f, (long)target, SEEK_SET);
    // skip to the end of the current (possibly multi-chunk) line
    bool at_start = false;
    while (!at_start) {
      if (std::fgets(buf.data(), (int)buf.size(), f) == nullptr) break;
      at_start = chunk_completes_line(
          buf.data(), std::strlen(buf.data()), buf.size());
    }
    // record the first bytes of the next lines (true line starts only)
    int64_t offs[8];
    char c0[8];
    int got = 0;
    while (got < 8 && at_start) {
      int64_t o = std::ftell(f);
      if (std::fgets(buf.data(), (int)buf.size(), f) == nullptr) break;
      size_t len = std::strlen(buf.data());
      offs[got] = o;
      c0[got] = buf[0];
      ++got;
      // consume continuation chunks of an over-long line
      bool done = chunk_completes_line(buf.data(), len, buf.size());
      while (!done) {
        if (std::fgets(buf.data(), (int)buf.size(), f) == nullptr) break;
        done = chunk_completes_line(
            buf.data(), std::strlen(buf.data()), buf.size());
      }
      at_start = done;
    }
    int64_t start = size;
    for (int j = 0; j + 2 < got; ++j) {
      if (c0[j] == '@' && c0[j + 2] == '+') {
        start = offs[j];
        break;
      }
    }
    aligned[i] = start;
  }
  aligned[nsplits] = size;
  // starts must be monotone (a split window may overrun the next target)
  for (int64_t i = 1; i <= nsplits; ++i)
    if (aligned[i] < aligned[i - 1]) aligned[i] = aligned[i - 1];
  std::fclose(f);
  return 0;
}

namespace {

// Parse records whose header offset lies in [lo, hi); returns count and max
// sequence length, and (when codes != nullptr) decodes into rows starting
// at row0.
void parse_split(const char* path, int64_t lo, int64_t hi, uint8_t* codes,
                 int32_t* lens, int64_t stride, int64_t row0, int64_t* n_out,
                 int64_t* mx_out) {
  FILE* f = std::fopen(path, "rb");
  int64_t n = 0, mx = 0;
  if (f != nullptr) {
    std::fseek(f, (long)lo, SEEK_SET);
    std::vector<char> line(1 << 20);
    int64_t pos = lo;
    int phase = 0;       // 0=header 1=seq 2=plus 3=qual
    int64_t seq_len = 0;  // sequence accumulated across chunks of one line
    while (pos < hi && std::fgets(line.data(), (int)line.size(), f)) {
      size_t len = std::strlen(line.data());
      bool complete = chunk_completes_line(line.data(), len, line.size());
      if (phase == 1) {
        // a sequence line may span several fgets chunks (reads longer than
        // the buffer); decode each chunk in place, advance phase only when
        // the physical line ends
        size_t sl = len;
        while (sl > 0 && (line[sl - 1] == '\n' || line[sl - 1] == '\r')) --sl;
        if (codes != nullptr && seq_len < stride) {
          int64_t w = (int64_t)sl;
          if (w > stride - seq_len) w = stride - seq_len;
          uint8_t* row = codes + (row0 + n) * stride + seq_len;
          for (int64_t i = 0; i < w; ++i)
            row[i] = kCodes.t[(uint8_t)line[i]];
        }
        seq_len += (int64_t)sl;
        if (complete) {
          if (seq_len > mx) mx = seq_len;
          if (codes != nullptr) {
            lens[row0 + n] =
                (int32_t)(seq_len < stride ? seq_len : stride);
          }
          ++n;
          seq_len = 0;
        }
      }
      if (complete) phase = (phase + 1) % 4;
      pos += (int64_t)len;
    }
    std::fclose(f);
  }
  *n_out = n;
  *mx_out = mx;
}

}  // namespace

// Scan all splits in parallel: counts[] and maxlens[] get one entry per
// split. Returns 0 on success.
int rfx_fastq_scan_mt(const char* path, const int64_t* aligned,
                      int64_t nsplits, int64_t* counts, int64_t* maxlens) {
  std::vector<std::thread> ts;
  for (int64_t i = 0; i < nsplits; ++i) {
    ts.emplace_back([=]() {
      parse_split(path, aligned[i], aligned[i + 1], nullptr, nullptr, 0, 0,
                  &counts[i], &maxlens[i]);
    });
  }
  for (auto& t : ts) t.join();
  return 0;
}

// Decode all splits in parallel into a preallocated (total x stride) matrix;
// row_offsets[] gives each split's first output row (prefix sums of the
// scan counts). Returns total records decoded.
int64_t rfx_fastq_load_mt(const char* path, const int64_t* aligned,
                          const int64_t* row_offsets, int64_t nsplits,
                          uint8_t* codes, int32_t* lens, int64_t stride) {
  std::vector<std::thread> ts;
  std::vector<int64_t> ns(nsplits), mxs(nsplits);
  for (int64_t i = 0; i < nsplits; ++i) {
    ts.emplace_back([=, &ns, &mxs]() {
      parse_split(path, aligned[i], aligned[i + 1], codes, lens, stride,
                  row_offsets[i], &ns[i], &mxs[i]);
    });
  }
  for (auto& t : ts) t.join();
  int64_t total = 0;
  for (int64_t i = 0; i < nsplits; ++i) total += ns[i];
  return total;
}

// Pair overlap merge (flash equivalent). For each pair i, finds the overlap
// o in [min_overlap, min(l1,l2)] between r1's suffix and revcomp(r2)'s
// prefix with the lowest mismatch density <= max_mismatch (ties -> longer
// overlap). Writes best overlap length (0 = unmerged) into best_o.
void rfx_merge_pairs(const uint8_t* m1, const int32_t* l1, int64_t stride1,
                     const uint8_t* m2, const int32_t* l2, int64_t stride2,
                     int64_t n_pairs, int32_t min_overlap,
                     double max_mismatch, int32_t* best_o) {
  std::vector<uint8_t> rc;
  for (int64_t i = 0; i < n_pairs; ++i) {
    const uint8_t* a = m1 + i * stride1;
    const uint8_t* b = m2 + i * stride2;
    int32_t la = l1[i], lb = l2[i];
    rc.assign(lb, 0);
    for (int32_t j = 0; j < lb; ++j) rc[j] = 3 - b[lb - 1 - j];
    int32_t best = 0;
    double best_mm = 1.0;
    int32_t max_o = la < lb ? la : lb;
    for (int32_t o = min_overlap; o <= max_o; ++o) {
      int32_t mm = 0;
      const uint8_t* suf = a + la - o;
      for (int32_t j = 0; j < o; ++j) mm += (suf[j] != rc[j]);
      double d = (double)mm / o;
      if (d <= max_mismatch && (d < best_mm || (d == best_mm && o > best))) {
        best = o;
        best_mm = d;
      }
    }
    best_o[i] = best;
  }
}

// Contig containment dedup (ReflexivDSDynamicKmerDedup equivalent; mirrors
// reflexiv_tpu.dynamic.dedup_contigs exactly). Input: 2-bit contig codes
// concatenated into `codes` with row offsets (n+1 entries), PRE-SORTED by
// length descending with exact duplicates already removed. A contig is
// dropped when it (or its reverse complement) is a substring of an already
// kept contig; candidates are seeded through a strided k-mer hash index so
// the scan stays near-linear. Writes 1/0 into keep; returns kept count.
int64_t rfx_dedup(const uint8_t* codes, const int64_t* offsets, int64_t n,
                  int32_t seed_k, int32_t stride, uint8_t* keep) {
  if (seed_k <= 0 || seed_k > 31 || stride <= 0) return -1;
  const uint64_t mask =
      seed_k == 32 ? ~0ULL : ((1ULL << (2 * seed_k)) - 1ULL);

  struct Hit {
    uint64_t key;
    int32_t id;
  };
  // open-addressing multimap: power-of-two table of (key, kept id)
  std::vector<Hit> table;
  size_t t_cap = 1 << 12;
  size_t t_n = 0;
  table.assign(t_cap, Hit{~0ULL, -1});
  auto hashv = [](uint64_t k) {
    k ^= k >> 33;
    k *= 0xff51afd7ed558ccdULL;
    k ^= k >> 33;
    return k;
  };
  auto grow = [&]() {
    std::vector<Hit> old;
    old.swap(table);
    t_cap <<= 1;
    table.assign(t_cap, Hit{~0ULL, -1});
    for (const Hit& h : old) {
      if (h.id < 0) continue;
      size_t p = hashv(h.key) & (t_cap - 1);
      while (table[p].id >= 0) p = (p + 1) & (t_cap - 1);
      table[p] = h;
    }
  };
  auto insert = [&](uint64_t key, int32_t id) {
    if (2 * (t_n + 1) > t_cap) grow();
    size_t p = hashv(key) & (t_cap - 1);
    while (table[p].id >= 0) p = (p + 1) & (t_cap - 1);
    table[p] = Hit{key, id};
    ++t_n;
  };

  std::vector<int32_t> kept;           // kept row ids, in keep order
  std::vector<uint8_t> rc;             // scratch: reverse complement
  std::vector<int32_t> cands;

  auto contains = [&](const uint8_t* hay, int64_t hay_len,
                      const uint8_t* needle, int64_t nd_len) {
    if (nd_len > hay_len) return false;
    return memmem(hay, (size_t)hay_len, needle, (size_t)nd_len) != nullptr;
  };

  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* s = codes + offsets[i];
    const int64_t len = offsets[i + 1] - offsets[i];
    rc.assign((size_t)len, 0);
    for (int64_t j = 0; j < len; ++j) rc[j] = 3 - s[len - 1 - j];

    bool contained = false;
    if (len < seed_k + stride - 1) {
      // too short for the probe-window guarantee: exact scan of all kept
      for (int32_t c : kept) {
        const uint8_t* t = codes + offsets[c];
        const int64_t tl = offsets[c + 1] - offsets[c];
        if (contains(t, tl, s, len) || contains(t, tl, rc.data(), len)) {
          contained = true;
          break;
        }
      }
    } else {
      // one dense window of `stride` consecutive probes per strand hits a
      // stored strided seed for any true containment
      cands.clear();
      for (int pass = 0; pass < 2 && !contained; ++pass) {
        const uint8_t* q = pass == 0 ? s : rc.data();
        uint64_t v = 0;
        for (int32_t j = 0; j < seed_k - 1; ++j) v = (v << 2) | q[j];
        const int32_t probes =
            (int32_t)((stride < len - seed_k + 1) ? stride
                                                  : len - seed_k + 1);
        for (int32_t j = 0; j < probes; ++j) {
          v = ((v << 2) | q[j + seed_k - 1]) & mask;
          size_t p = hashv(v) & (t_cap - 1);
          while (table[p].id >= 0) {
            if (table[p].key == v) cands.push_back(table[p].id);
            p = (p + 1) & (t_cap - 1);
          }
        }
      }
      for (int32_t c : cands) {
        const uint8_t* t = codes + offsets[c];
        const int64_t tl = offsets[c + 1] - offsets[c];
        if (contains(t, tl, s, len) || contains(t, tl, rc.data(), len)) {
          contained = true;
          break;
        }
      }
    }
    keep[i] = contained ? 0 : 1;
    if (!contained) {
      kept.push_back((int32_t)i);
      if (len >= seed_k) {
        for (int64_t start = 0; start + seed_k <= len; start += stride) {
          uint64_t vfull = 0;
          for (int32_t j = 0; j < seed_k; ++j)
            vfull = (vfull << 2) | s[start + j];
          insert(vfull & mask, (int32_t)i);
        }
      }
    }
  }
  return (int64_t)kept.size();
}

// K-mer-spectrum error correction, the in-order per-read scan of
// reflexiv_tpu.preprocess.correct_reads_scalar (the lighter-equivalent,
// cf. ErrorCorrectionLighterPipe, ReflexivDataFrameErrorCorrecter.java:
// 551-633): a position covered by no solid window is substituted when
// exactly ONE alternative makes every covering window solid; earlier
// fixes in a read are visible to later positions of the same pass.
// Reads are independent -> parallel over row ranges. quals/trust > 0
// adds the -trustqual gate (phred >= trust is never substituted).

static inline uint64_t rfx_canon_of(const uint8_t* w, int32_t k) {
  uint64_t v = 0, rc = 0;
  for (int32_t i = 0; i < k; ++i) v = (v << 2) | w[i];
  for (int32_t i = k - 1; i >= 0; --i) rc = (rc << 2) | (3u ^ w[i]);
  return v < rc ? v : rc;
}

static inline bool rfx_in_solid(const uint64_t* s, int64_t n, uint64_t v) {
  int64_t lo = 0, hi = n;
  while (lo < hi) {
    int64_t m = (lo + hi) >> 1;
    if (s[m] < v) lo = m + 1; else hi = m;
  }
  return lo < n && s[lo] == v;
}

extern "C" int64_t rfx_correct(
    uint8_t* mat, const int32_t* lens, int64_t n_reads, int64_t stride,
    const uint64_t* solid, int64_t n_solid, int32_t k,
    const uint8_t* quals, int32_t trust, int32_t n_threads) {
  if (n_threads <= 0) n_threads = (int32_t)std::thread::hardware_concurrency();
  if (n_threads <= 0) n_threads = 2;
  std::vector<int64_t> fixed_per(n_threads, 0);
  std::vector<std::thread> pool;
  int64_t per = (n_reads + n_threads - 1) / n_threads;
  for (int32_t t = 0; t < n_threads; ++t) {
    int64_t lo = t * per, hi = std::min(n_reads, lo + per);
    if (lo >= hi) break;
    pool.emplace_back([=, &fixed_per]() {
      std::vector<int32_t> csum;   // window-solidity prefix sums
      int64_t fixed = 0;
      for (int64_t i = lo; i < hi; ++i) {
        int32_t n = lens[i];
        if (n < k + 1 || n > stride) continue;
        uint8_t* read = mat + i * stride;
        int32_t W = n - k + 1;
        csum.assign(W + 1, 0);
        // rolling canonical values of the ORIGINAL read (the weak map is
        // not updated by fixes, matching the oracle)
        uint64_t mask = (k < 32) ? ((1ULL << (2 * k)) - 1) : ~0ULL;
        uint64_t fwd = 0, rc = 0;
        int32_t top = 2 * (k - 1);
        bool any_weak = false;
        for (int32_t j = 0; j < n; ++j) {
          fwd = ((fwd << 2) | read[j]) & mask;
          rc = (rc >> 2) | ((uint64_t)(3u ^ read[j]) << top);
          if (j >= k - 1) {
            uint64_t canon = fwd < rc ? fwd : rc;
            bool s = rfx_in_solid(solid, n_solid, canon);
            csum[j - k + 2] = csum[j - k + 1] + (s ? 1 : 0);
            if (!s) any_weak = true;
          }
        }
        if (!any_weak) continue;
        for (int32_t p = 0; p < n; ++p) {
          int32_t w_lo = p - k + 1 > 0 ? p - k + 1 : 0;
          int32_t w_hi = (W < p + 1) ? W : p + 1;
          if (csum[w_hi] - csum[w_lo] > 0) continue;  // a solid window covers p
          if (quals != nullptr && trust > 0 &&
              quals[i * stride + p] >= (uint8_t)trust)
            continue;  // trusted base (-trustqual)
          uint8_t orig = read[p];
          int32_t n_cand = 0;
          uint8_t fix = 0;
          for (uint8_t b = 0; b < 4; ++b) {
            if (b == orig) continue;
            read[p] = b;
            bool all_solid = true;
            for (int32_t w = w_lo; w < w_hi && all_solid; ++w)
              all_solid = rfx_in_solid(solid, n_solid,
                                       rfx_canon_of(read + w, k));
            read[p] = orig;
            if (all_solid) { ++n_cand; fix = b; }
          }
          if (n_cand == 1) { read[p] = fix; ++fixed; }
        }
      }
      fixed_per[t] += fixed;
    });
  }
  for (auto& th : pool) th.join();
  int64_t total = 0;
  for (auto v : fixed_per) total += v;
  return total;
}

// End-window seed index build — the other patching hot spot
// (reflexiv_tpu.patching._end_index_arrays; the numpy build is
// concat+lexsort+gather bound). Input is the contigs' raw ASCII bytes
// concatenated (offsets[n+1]); for every contig the head and tail
// end_window regions contribute every all-ACGT k-window on both strands.
// Entries sort by (key, seqno) where seqno encodes (contig, region, j,
// strand) in the numpy path's exact scan order; a key whose placements
// disagree on (contig, region) is dropped, otherwise the first placement
// wins. Returns the kept count (out arrays are written in sorted key
// order), or -1 when the generated entry count exceeds cap.

namespace {

// (key, seqno) packed into one 128-bit integer: key in the high 64 bits, so
// a plain u128 compare IS the (key, seqno) lexicographic order — branchless
// and twice as fast to sort as a two-field struct comparator.
typedef unsigned __int128 IdxEntry;

inline IdxEntry idx_pack(uint64_t key, uint64_t seqno) {
  return ((IdxEntry)key << 64) | seqno;
}

inline bool rfx_is_acgt(uint8_t c) {
  return c == 'A' || c == 'C' || c == 'G' || c == 'T' || c == 'a' ||
         c == 'c' || c == 'g' || c == 't';
}

}  // namespace

extern "C" int64_t rfx_end_index(
    const uint8_t* ascii, const int64_t* offsets, int64_t n_contigs,
    int32_t k, int32_t end_window, uint64_t* out_keys, int64_t* out_ci,
    int8_t* out_end, int64_t* out_pos, int8_t* out_strand, int64_t cap,
    int32_t n_threads) {
  if (n_threads <= 0) n_threads = (int32_t)std::thread::hardware_concurrency();
  if (n_threads <= 0) n_threads = 2;
  const uint64_t Wg = (uint64_t)(end_window - k + 1);
  const uint64_t mask = (k < 32) ? ((1ULL << (2 * k)) - 1) : ~0ULL;
  const int32_t top = 2 * (k - 1);

  // generate entries in parallel over contig ranges
  std::vector<std::vector<IdxEntry>> per(n_threads);
  std::vector<std::thread> pool;
  int64_t span = (n_contigs + n_threads - 1) / n_threads;
  for (int32_t t = 0; t < n_threads; ++t) {
    int64_t lo = t * span, hi = std::min(n_contigs, lo + span);
    if (lo >= hi) break;
    pool.emplace_back([=, &per]() {
      std::vector<IdxEntry>& out = per[t];
      int64_t bound = 0;   // reserve: 2 regions x 2 strands per window
      for (int64_t c = lo; c < hi; ++c) {
        const int64_t len = offsets[c + 1] - offsets[c];
        const int64_t w = len < end_window ? len : end_window;
        if (w >= k) bound += 4 * (w - k + 1);
      }
      out.reserve((size_t)bound);
      for (int64_t c = lo; c < hi; ++c) {
        const uint8_t* s = ascii + offsets[c];
        const int64_t len = offsets[c + 1] - offsets[c];
        const int64_t w = len < end_window ? len : end_window;
        if (w < k) continue;
        for (int region = 0; region < 2; ++region) {
          const uint8_t* r = region == 0 ? s : s + (len - w);
          uint64_t fwd = 0, rc = 0;
          int32_t run = 0;   // ACGT run length ending at current base
          const uint64_t base_seq =
              ((uint64_t)c * 2 + region) * (2 * Wg);
          for (int64_t j = 0; j < w; ++j) {
            const uint8_t ch = r[j];
            run = rfx_is_acgt(ch) ? run + 1 : 0;
            const uint64_t code = kCodes.t[ch];
            fwd = ((fwd << 2) | code) & mask;
            rc = (rc >> 2) | ((3ULL ^ code) << top);
            if (j >= k - 1 && run >= k) {
              const uint64_t sq = base_seq + (uint64_t)(j - k + 1) * 2;
              out.push_back(idx_pack(fwd, sq));
              out.push_back(idx_pack(rc, sq + 1));
            }
          }
        }
      }
    });
  }
  for (auto& th : pool) th.join();
  pool.clear();
  int64_t total = 0;
  for (auto& v : per) total += (int64_t)v.size();
  if (total > cap) return -1;
  if (total == 0) return 0;
  std::vector<IdxEntry> all(total);
  int64_t at = 0;
  for (auto& v : per) {
    std::memcpy(all.data() + at, v.data(), v.size() * sizeof(IdxEntry));
    at += (int64_t)v.size();
    v.clear();
    v.shrink_to_fit();
  }
  // 2-way parallel sort + merge (this host has few cores; deeper trees
  // don't pay)
  if (n_threads >= 2 && total > (1 << 20)) {
    int64_t mid = total / 2;
    std::thread t1([&]() { std::sort(all.begin(), all.begin() + mid); });
    std::sort(all.begin() + mid, all.end());
    t1.join();
    std::inplace_merge(all.begin(), all.begin() + mid, all.end());
  } else {
    std::sort(all.begin(), all.end());
  }

  // group scan: first placement wins; (contig, region)-disagreement kills
  const uint64_t region_div = 2 * Wg;
  int64_t kept = 0;
  int64_t g = 0;
  while (g < total) {
    int64_t e = g + 1;
    const uint64_t key = (uint64_t)(all[g] >> 64);
    const uint64_t first_cie = ((uint64_t)all[g]) / region_div;
    bool disagree = false;
    while (e < total && (uint64_t)(all[e] >> 64) == key) {
      if (((uint64_t)all[e]) / region_div != first_cie) disagree = true;
      ++e;
    }
    if (!disagree) {
      const uint64_t sq = (uint64_t)all[g];
      const int64_t ci = (int64_t)(sq / (2 * region_div));
      const int region = (int)((sq / region_div) & 1);
      const int64_t j = (int64_t)((sq % region_div) / 2);
      const int strand = (int)(sq & 1);
      const int64_t len = offsets[ci + 1] - offsets[ci];
      const int64_t w = len < end_window ? len : end_window;
      const int64_t base = region == 0 ? 0 : len - w;
      out_keys[kept] = key;
      out_ci[kept] = ci;
      out_end[kept] = (int8_t)region;
      out_pos[kept] = base + j;
      out_strand[kept] = (int8_t)strand;
      ++kept;
    }
    g = e;
  }
  return kept;
}

// Hashed end-to-end patching front-end: build the end-window index as an
// open-addressing hash (no 100M-entry sort) and map every pair against it
// in the same call. Semantically identical to rfx_end_index +
// rfx_map_pairs: the dedup rule ("first placement in scan order wins; a
// key whose placements disagree on (contig, end) is dropped") is
// order-independent — disagreement <=> two placements with different
// (contig, end) exist, and the representative is the min-seqno placement —
// so a hash built in any insertion order yields the same mapping as the
// sorted build. Payloads are recomputed from the packed seqno.

namespace {

struct PatchHash {
  // slot: key (sentinel ~0ULL empty) + val = min seqno | disagree<<63
  std::vector<uint64_t> keys;
  std::vector<uint64_t> vals;
  uint64_t mask = 0;

  void init(size_t slots) {
    keys.assign(slots, ~0ULL);
    vals.assign(slots, 0);
    mask = slots - 1;
  }
};

inline uint64_t rfx_hash64(uint64_t k) {
  k ^= k >> 33;
  k *= 0xff51afd7ed558ccdULL;
  k ^= k >> 33;
  k *= 0xc4ceb9fe1a85ec53ULL;
  k ^= k >> 33;
  return k;
}

constexpr uint64_t kDisagree = 1ULL << 63;

inline void hash_insert(PatchHash& h, uint64_t key, uint64_t seqno,
                        uint64_t region_div) {
  uint64_t p = rfx_hash64(key) & h.mask;
  while (true) {
    if (h.keys[p] == ~0ULL) {
      h.keys[p] = key;
      h.vals[p] = seqno;
      return;
    }
    if (h.keys[p] == key) {
      uint64_t v = h.vals[p];
      uint64_t kept = v & ~kDisagree;
      uint64_t flag = v & kDisagree;
      if (kept / region_div != seqno / region_div) flag = kDisagree;
      if (seqno < kept) kept = seqno;
      h.vals[p] = kept | flag;
      return;
    }
    p = (p + 1) & h.mask;
  }
}

// returns seqno or ~0ULL when absent/ambiguous
inline uint64_t hash_lookup(const PatchHash& h, uint64_t key) {
  uint64_t p = rfx_hash64(key) & h.mask;
  while (true) {
    const uint64_t k = h.keys[p];
    if (k == ~0ULL) return ~0ULL;
    if (k == key) {
      const uint64_t v = h.vals[p];
      return (v & kDisagree) ? ~0ULL : v;
    }
    p = (p + 1) & h.mask;
  }
}

// one read's strided-seed map against the hash (dir as in map_one_read)
inline void map_one_read_hash(
    const uint8_t* s, int64_t n, int dir, const PatchHash& h,
    const int64_t* coffsets, int32_t k, int32_t end_window,
    int32_t seed_stride, uint64_t mask, uint64_t region_div,
    int64_t* o_ci, int8_t* o_end, int64_t* o_pos, int8_t* o_strand,
    uint8_t* o_mapped) {
  *o_ci = 0; *o_end = 0; *o_pos = 0; *o_strand = 0; *o_mapped = 0;
  if (n < k) return;
  uint64_t v = 0;
  int32_t run = 0;
  int32_t next_seed = 0;
  const int64_t n_win = n - k + 1;
  for (int64_t j = 0; j < n; ++j) {
    const uint8_t ch = dir == 0 ? s[j] : s[n - 1 - j];
    const uint64_t code =
        dir == 0 ? kCodes.t[ch] : (3ULL ^ kCodes.t[ch]);
    run = rfx_is_acgt(ch) ? run + 1 : 0;
    v = ((v << 2) | code) & mask;
    const int64_t w = j - k + 1;
    if (w < 0 || w >= n_win) continue;
    if (w != next_seed) continue;
    next_seed += seed_stride;
    if (run < k) continue;
    const uint64_t sq = hash_lookup(h, v);
    if (sq == ~0ULL) continue;
    const int64_t ci = (int64_t)(sq / (2 * region_div));
    const int region = (int)((sq / region_div) & 1);
    const int64_t jj = (int64_t)((sq % region_div) / 2);
    const int strand = (int)(sq & 1);
    const int64_t len = coffsets[ci + 1] - coffsets[ci];
    const int64_t wv = len < end_window ? len : end_window;
    const int64_t base = region == 0 ? 0 : len - wv;
    const int64_t pos = base + jj;
    *o_ci = ci;
    *o_end = (int8_t)region;
    *o_pos = strand == 0 ? pos - w : pos + k - 1 + w;
    *o_strand = (int8_t)strand;
    *o_mapped = 1;
    return;
  }
}

}  // namespace

// Build the hashed end-window index from the contigs' concatenated ASCII
// bytes and map both mates of every pair against it — the whole patching
// mapping front-end in one call (no sort, no sorted-array binary search).
// Returns 0, or -1 on bad parameters.
extern "C" int32_t rfx_map_pairs_hashed(
    const uint8_t* cascii, const int64_t* coffsets, int64_t n_contigs,
    int32_t k, int32_t end_window, const uint8_t* ascii1,
    const int64_t* offsets1, const uint8_t* ascii2, const int64_t* offsets2,
    int64_t n_pairs, int32_t seed_stride, int64_t* c1, int8_t* e1,
    int64_t* p1, int8_t* s1, uint8_t* m1, int64_t* c2, int8_t* e2,
    int64_t* p2, int8_t* s2, uint8_t* m2, int32_t n_threads) {
  if (k <= 0 || k > 31 || end_window < k) return -1;
  if (n_threads <= 0) n_threads = (int32_t)std::thread::hardware_concurrency();
  if (n_threads <= 0) n_threads = 2;
  const uint64_t Wg = (uint64_t)(end_window - k + 1);
  const uint64_t region_div = 2 * Wg;
  const uint64_t mask = (k < 32) ? ((1ULL << (2 * k)) - 1) : ~0ULL;
  const int32_t top = 2 * (k - 1);

  // phase 1: generate (key, seqno) entries in parallel over contig ranges
  std::vector<std::vector<IdxEntry>> per(n_threads);
  {
    std::vector<std::thread> pool;
    int64_t span = (n_contigs + n_threads - 1) / n_threads;
    for (int32_t t = 0; t < n_threads; ++t) {
      int64_t lo = t * span, hi = std::min(n_contigs, lo + span);
      if (lo >= hi) break;
      pool.emplace_back([=, &per]() {
        std::vector<IdxEntry>& out = per[t];
        int64_t bound = 0;
        for (int64_t c = lo; c < hi; ++c) {
          const int64_t len = coffsets[c + 1] - coffsets[c];
          const int64_t w = len < end_window ? len : end_window;
          if (w >= k) bound += 4 * (w - k + 1);
        }
        out.reserve((size_t)bound);
        for (int64_t c = lo; c < hi; ++c) {
          const uint8_t* s = cascii + coffsets[c];
          const int64_t len = coffsets[c + 1] - coffsets[c];
          const int64_t w = len < end_window ? len : end_window;
          if (w < k) continue;
          for (int region = 0; region < 2; ++region) {
            const uint8_t* r = region == 0 ? s : s + (len - w);
            uint64_t fwd = 0, rc = 0;
            int32_t run = 0;
            const uint64_t base_seq =
                ((uint64_t)c * 2 + region) * region_div;
            for (int64_t j = 0; j < w; ++j) {
              const uint8_t ch = r[j];
              run = rfx_is_acgt(ch) ? run + 1 : 0;
              const uint64_t code = kCodes.t[ch];
              fwd = ((fwd << 2) | code) & mask;
              rc = (rc >> 2) | ((3ULL ^ code) << top);
              if (j >= k - 1 && run >= k) {
                const uint64_t sq = base_seq + (uint64_t)(j - k + 1) * 2;
                out.push_back(idx_pack(fwd, sq));
                out.push_back(idx_pack(rc, sq + 1));
              }
            }
          }
        }
      });
    }
    for (auto& th : pool) th.join();
  }
  int64_t total = 0;
  for (auto& v : per) total += (int64_t)v.size();

  // phase 2: shard the hash by a hash bit; each shard thread scans every
  // generation buffer and inserts only its own keys (sequential reads,
  // private random writes — no locks)
  const int32_t n_shards = n_threads >= 2 ? 2 : 1;
  size_t slots = 2048;
  // per-shard slots >= total entries => load factor <= ~0.5 even if every
  // entry were unique and landed in one shard
  while ((int64_t)slots < 2 * total + 1) slots <<= 1;
  slots = slots / n_shards < 1024 ? 1024 : slots / n_shards;
  std::vector<PatchHash> shards(n_shards);
  {
    std::vector<std::thread> pool;
    for (int32_t t = 0; t < n_shards; ++t) {
      pool.emplace_back([=, &shards, &per]() {
        PatchHash& h = shards[t];
        h.init(slots);
        for (const auto& vec : per) {
          for (const IdxEntry& e : vec) {
            const uint64_t key = (uint64_t)(e >> 64);
            if (n_shards > 1 &&
                (int32_t)(rfx_hash64(key) >> 63) != t) continue;
            hash_insert(h, key, (uint64_t)e, region_div);
          }
        }
      });
    }
    for (auto& th : pool) th.join();
  }
  for (auto& v : per) {
    v.clear();
    v.shrink_to_fit();
  }

  // phase 3: map pairs in parallel
  {
    std::vector<std::thread> pool;
    int64_t span = (n_pairs + n_threads - 1) / n_threads;
    for (int32_t t = 0; t < n_threads; ++t) {
      int64_t lo = t * span, hi = std::min(n_pairs, lo + span);
      if (lo >= hi) break;
      pool.emplace_back([=, &shards]() {
        auto look = [&](const uint8_t* s, int64_t n, int dir, int64_t i,
                        int64_t* oc, int8_t* oe, int64_t* op, int8_t* os,
                        uint8_t* om) {
          // pick shard per probe inside map: wrap via lambda-less copy of
          // map_one_read_hash but with shard dispatch — use a tiny proxy
          // hash view when sharded
          if (n_shards == 1) {
            map_one_read_hash(s, n, dir, shards[0], coffsets, k,
                              end_window, seed_stride, mask, region_div,
                              oc + i, oe + i, op + i, os + i, om + i);
            return;
          }
          // sharded: duplicate the scan with per-key shard choice
          oc[i] = 0; oe[i] = 0; op[i] = 0; os[i] = 0; om[i] = 0;
          if (n < k) return;
          uint64_t v = 0;
          int32_t run = 0;
          int32_t next_seed = 0;
          const int64_t n_win = n - k + 1;
          for (int64_t j = 0; j < n; ++j) {
            const uint8_t ch = dir == 0 ? s[j] : s[n - 1 - j];
            const uint64_t code =
                dir == 0 ? kCodes.t[ch] : (3ULL ^ kCodes.t[ch]);
            run = rfx_is_acgt(ch) ? run + 1 : 0;
            v = ((v << 2) | code) & mask;
            const int64_t w = j - k + 1;
            if (w < 0 || w >= n_win) continue;
            if (w != next_seed) continue;
            next_seed += seed_stride;
            if (run < k) continue;
            const uint64_t hv = rfx_hash64(v);
            const PatchHash& h = shards[hv >> 63];
            uint64_t p = hv & h.mask;
            uint64_t sq = ~0ULL;
            while (true) {
              const uint64_t kk = h.keys[p];
              if (kk == ~0ULL) break;
              if (kk == v) {
                const uint64_t vv = h.vals[p];
                if (!(vv & kDisagree)) sq = vv;
                break;
              }
              p = (p + 1) & h.mask;
            }
            if (sq == ~0ULL) continue;
            const int64_t ci = (int64_t)(sq / (2 * region_div));
            const int region = (int)((sq / region_div) & 1);
            const int64_t jj = (int64_t)((sq % region_div) / 2);
            const int strand = (int)(sq & 1);
            const int64_t clen = coffsets[ci + 1] - coffsets[ci];
            const int64_t wv = clen < end_window ? clen : end_window;
            const int64_t base = region == 0 ? 0 : clen - wv;
            const int64_t pos = base + jj;
            oc[i] = ci;
            oe[i] = (int8_t)region;
            op[i] = strand == 0 ? pos - w : pos + k - 1 + w;
            os[i] = (int8_t)strand;
            om[i] = 1;
            return;
          }
        };
        for (int64_t i = lo; i < hi; ++i) {
          look(ascii1 + offsets1[i], offsets1[i + 1] - offsets1[i], 0, i,
               c1, e1, p1, s1, m1);
          look(ascii2 + offsets2[i], offsets2[i + 1] - offsets2[i], 1, i,
               c2, e2, p2, s2, m2);
        }
      });
    }
    for (auto& th : pool) th.join();
  }
  return 0;
}

// Strided-seed read mapping against a sorted end-window key index — the hot
// loop of the patching stage (reflexiv_tpu.patching._map_reads_arrays; the
// reference runs the analogous ReadAndContigPairs scan on every executor,
// ReflexivDSDynamicKmerPatching.java:2146-2591). For each read: roll the
// forward 2-bit window value, probe every seed_stride-th window in the
// sorted key table (lower_bound), first hit wins (early exit — the numpy
// oracle evaluates all seeds then takes argmax; outputs are identical
// because both take the FIRST valid hit in seed order). Reads are
// independent -> parallel over row ranges.

static inline int64_t rfx_lower_bound(const uint64_t* s, int64_t n,
                                      uint64_t v) {
  int64_t lo = 0, hi = n;
  while (lo < hi) {
    int64_t m = (lo + hi) >> 1;
    if (s[m] < v) lo = m + 1; else hi = m;
  }
  return lo;
}

namespace {

// One read's strided-seed map against the sorted key index, straight from
// ASCII bytes (dir=0 forward, dir=1 reverse complement — the numpy oracle
// maps mate 2 through a reverse-complemented code matrix; iterating the
// original bytes backwards with complemented codes is the same sequence).
// N bases code as 'T' forward / 'A' reverse (3 - code), exactly like
// encode_ascii + revcomp_matrix, but windows containing a non-ACGT byte
// never seed (the _window_acgt_ok mask). Writes the first valid hit.
inline void map_one_read(const uint8_t* s, int64_t n, int dir,
                         const uint64_t* keys, int64_t n_keys,
                         const int64_t* ici, const int8_t* iend,
                         const int64_t* ipos, const int8_t* istrand,
                         int32_t k, int32_t seed_stride, uint64_t mask,
                         int64_t* o_ci, int8_t* o_end, int64_t* o_pos,
                         int8_t* o_strand, uint8_t* o_mapped) {
  *o_ci = 0; *o_end = 0; *o_pos = 0; *o_strand = 0; *o_mapped = 0;
  if (n < k || n_keys == 0) return;
  uint64_t v = 0;
  int32_t run = 0;
  int32_t next_seed = 0;
  const int64_t n_win = n - k + 1;
  for (int64_t j = 0; j < n; ++j) {
    const uint8_t ch = dir == 0 ? s[j] : s[n - 1 - j];
    const uint64_t code =
        dir == 0 ? kCodes.t[ch] : (3ULL ^ kCodes.t[ch]);
    run = rfx_is_acgt(ch) ? run + 1 : 0;
    v = ((v << 2) | code) & mask;
    const int64_t w = j - k + 1;   // window start
    if (w < 0 || w >= n_win) continue;
    if (w != next_seed) continue;
    next_seed += seed_stride;
    if (run < k) continue;
    int64_t p = rfx_lower_bound(keys, n_keys, v);
    if (p >= n_keys || keys[p] != v) continue;
    *o_ci = ici[p];
    *o_end = iend[p];
    *o_pos = istrand[p] == 0 ? ipos[p] - w : ipos[p] + k - 1 + w;
    *o_strand = istrand[p];
    *o_mapped = 1;
    return;
  }
}

}  // namespace

// Map both mates of every pair against the end-window index, straight from
// the pairs' concatenated ASCII bytes (offsets1/offsets2 ragged layout) —
// no padded matrices, no host-side reverse-complement materialization.
// Mate 1 maps forward, mate 2 reverse-complemented, matching
// patch_contigs' numpy front-end exactly.
extern "C" void rfx_map_pairs(
    const uint8_t* ascii1, const int64_t* offsets1, const uint8_t* ascii2,
    const int64_t* offsets2, int64_t n_pairs, const uint64_t* keys,
    int64_t n_keys, const int64_t* ici, const int8_t* iend,
    const int64_t* ipos, const int8_t* istrand, int32_t k,
    int32_t seed_stride, int64_t* c1, int8_t* e1, int64_t* p1, int8_t* s1,
    uint8_t* m1, int64_t* c2, int8_t* e2, int64_t* p2, int8_t* s2,
    uint8_t* m2, int32_t n_threads) {
  if (n_threads <= 0) n_threads = (int32_t)std::thread::hardware_concurrency();
  if (n_threads <= 0) n_threads = 2;
  const uint64_t mask = (k < 32) ? ((1ULL << (2 * k)) - 1) : ~0ULL;
  std::vector<std::thread> pool;
  int64_t per = (n_pairs + n_threads - 1) / n_threads;
  for (int32_t t = 0; t < n_threads; ++t) {
    int64_t lo = t * per, hi = std::min(n_pairs, lo + per);
    if (lo >= hi) break;
    pool.emplace_back([=]() {
      for (int64_t i = lo; i < hi; ++i) {
        map_one_read(ascii1 + offsets1[i], offsets1[i + 1] - offsets1[i], 0,
                     keys, n_keys, ici, iend, ipos, istrand, k, seed_stride,
                     mask, c1 + i, e1 + i, p1 + i, s1 + i, m1 + i);
        map_one_read(ascii2 + offsets2[i], offsets2[i + 1] - offsets2[i], 1,
                     keys, n_keys, ici, iend, ipos, istrand, k, seed_stride,
                     mask, c2 + i, e2 + i, p2 + i, s2 + i, m2 + i);
      }
    });
  }
  for (auto& th : pool) th.join();
}

// Longest exact tail(a)/head(b) overlap in [min_overlap, min(la, lb)]
// (patching's _try_overlap_join scan, without the per-length Python slice
// allocations). Returns 0 when none.
extern "C" int32_t rfx_best_overlap(const uint8_t* a, int64_t la,
                                    const uint8_t* b, int64_t lb,
                                    int32_t min_overlap) {
  int64_t max_o = la < lb ? la : lb;
  for (int64_t o = max_o; o >= min_overlap; --o) {
    if (std::memcmp(a + la - o, b, (size_t)o) == 0) return (int32_t)o;
  }
  return 0;
}

extern "C" void rfx_map_seeds(
    const uint8_t* mat, const int32_t* lens, int64_t n_reads, int64_t stride,
    const uint64_t* keys, int64_t n_keys, const int64_t* ici,
    const int8_t* iend, const int64_t* ipos, const int8_t* istrand,
    int32_t k, int32_t seed_stride, const uint8_t* acgt,
    int64_t* out_ci, int8_t* out_end, int64_t* out_pos, int8_t* out_strand,
    uint8_t* out_mapped, int32_t n_threads) {
  if (n_threads <= 0) n_threads = (int32_t)std::thread::hardware_concurrency();
  if (n_threads <= 0) n_threads = 2;
  const int64_t W = stride - k + 1;   // seed grid width (padded-matrix windows)
  std::vector<std::thread> pool;
  int64_t per = (n_reads + n_threads - 1) / n_threads;
  for (int32_t t = 0; t < n_threads; ++t) {
    int64_t r_lo = t * per, r_hi = std::min(n_reads, r_lo + per);
    if (r_lo >= r_hi) break;
    pool.emplace_back([=]() {
      const uint64_t mask = (k < 32) ? ((1ULL << (2 * k)) - 1) : ~0ULL;
      for (int64_t i = r_lo; i < r_hi; ++i) {
        out_ci[i] = 0; out_end[i] = 0; out_pos[i] = 0; out_strand[i] = 0;
        out_mapped[i] = 0;
        const int32_t n = lens[i];
        if (n < k || n_keys == 0 || W <= 0) continue;
        const uint8_t* read = mat + i * stride;
        const uint8_t* ac = acgt != nullptr ? acgt + i * W : nullptr;
        uint64_t v = 0;
        for (int32_t j = 0; j < k - 1; ++j) v = (v << 2) | read[j];
        int32_t next_seed = 0;
        const int32_t n_win = n - k + 1;   // valid == j+k <= n on the grid
        for (int32_t j = 0; j < n_win; ++j) {
          v = ((v << 2) | read[j + k - 1]) & mask;
          if (j != next_seed) continue;
          next_seed += seed_stride;
          if (ac != nullptr && !ac[j]) continue;
          int64_t p = rfx_lower_bound(keys, n_keys, v);
          if (p >= n_keys || keys[p] != v) continue;
          out_ci[i] = ici[p];
          out_end[i] = iend[p];
          out_pos[i] = istrand[p] == 0 ? ipos[p] - j : ipos[p] + k - 1 + j;
          out_strand[i] = istrand[p];
          out_mapped[i] = 1;
          break;
        }
      }
    });
  }
  for (auto& th : pool) th.join();
}

}  // extern "C"
