// Native IO + alignment-ingest hot path for nextpolish2_tpu.
//
// Covers the reference's native layer (rust-htslib/htslib BAM decode, Cargo.toml:21)
// plus its per-read CPU hot loops (fill_with_cigar main.rs:386-440, trim
// main.rs:446-513, AlignSeq packing main.rs:278-338, update_msas kmer stream
// main.rs:576-589) in one pass: BGZF -> BAM records -> filter -> expand -> trim ->
// (t_pos, packed 3-mer key) stream per alignment.
//
// C ABI (ctypes); caller provides output buffers. No global state; thread-safe
// per-call. Build: build.sh -> libnp2native.so (requires zlib).

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <chrono>
#include <thread>
#include <vector>
#include <string>
#include <zlib.h>

// NP2_TIMING=1: per-stage timings on stderr (perf debugging on slow VMs).
static bool np2_timing() {
  static int v = -1;
  if (v < 0) { const char* e = getenv("NP2_TIMING"); v = (e && *e == '1') ? 1 : 0; }
  return v == 1;
}
static double np2_now() {
  return std::chrono::duration<double>(
      std::chrono::steady_clock::now().time_since_epoch()).count();
}
#define NP2_T(label, t0)                                             \
  do {                                                               \
    if (np2_timing())                                                \
      fprintf(stderr, "[np2 %-28s] %8.2fs\n", label, np2_now() - (t0)); \
  } while (0)

namespace {

// ---------- BGZF / BAM reading ----------

struct Bytes {
  std::vector<uint8_t> d;
};

// Inflate an entire BGZF (or plain gzip) file into memory.
static bool inflate_file(const char* path, Bytes& out) {
  gzFile f = gzopen(path, "rb");
  if (!f) return false;
  gzbuffer(f, 1 << 20);
  size_t cap = 1 << 22;
  out.d.resize(cap);
  size_t n = 0;
  for (;;) {
    if (n + (1 << 20) > out.d.size()) out.d.resize(out.d.size() * 2);
    int got = gzread(f, out.d.data() + n, 1 << 20);
    if (got < 0) { gzclose(f); return false; }
    if (got == 0) break;
    n += (size_t)got;
  }
  gzclose(f);
  out.d.resize(n);
  return true;
}

static inline uint32_t rd_u32(const uint8_t* p) {
  uint32_t v; memcpy(&v, p, 4); return v;
}
static inline int32_t rd_i32(const uint8_t* p) {
  int32_t v; memcpy(&v, p, 4); return v;
}
static inline uint16_t rd_u16(const uint8_t* p) {
  uint16_t v; memcpy(&v, p, 2); return v;
}

// ASCII -> code (A0 C1 G2 T3 -4 N5 M6; else 4), mirrors SEQ_NUM (kmer.rs:11-22)
static uint8_t kAscii2Code[256];
// BAM 4-bit seq code -> our base code
static uint8_t kSeq4ToCode[16];
static bool kTablesInit = false;

static void init_tables() {
  if (kTablesInit) return;
  for (int i = 0; i < 256; i++) kAscii2Code[i] = 4;
  kAscii2Code['A'] = kAscii2Code['a'] = 0;
  kAscii2Code['C'] = kAscii2Code['c'] = 1;
  kAscii2Code['G'] = kAscii2Code['g'] = 2;
  kAscii2Code['T'] = kAscii2Code['t'] = 3;
  kAscii2Code['U'] = kAscii2Code['u'] = 3;
  kAscii2Code['N'] = kAscii2Code['n'] = 5;
  kAscii2Code['M'] = kAscii2Code['m'] = 6;
  kAscii2Code['-'] = 4;
  const char* seq4 = "=ACMGRSVTWYHKDBN";
  for (int i = 0; i < 16; i++) kSeq4ToCode[i] = kAscii2Code[(uint8_t)seq4[i]];
  kTablesInit = true;
}

struct BamRec {
  int32_t tid, pos;
  uint16_t flag;
  uint8_t mapq;
  const uint8_t* cigar;  // n_cigar u32 entries
  uint32_t n_cigar;
  const uint8_t* seq4;   // packed 4-bit
  int32_t l_seq;
};

struct BamFile {
  Bytes raw;
  std::vector<std::pair<std::string, int64_t>> refs;
  size_t rec_off = 0;  // offset of first record
  // v2 staging: np2_extract_begin fills these; np2_extract_fetch drains them.
  std::vector<int64_t> st_t_pos;
  std::vector<int32_t> st_key;
  std::vector<int32_t> st_delta;
  std::vector<int32_t> st_read_start;
  std::vector<int64_t> st_aln_bounds;
  std::vector<uint8_t> st_clip;
};

static bool parse_bam_header(BamFile& bf) {
  const uint8_t* p = bf.raw.d.data();
  size_t n = bf.raw.d.size();
  if (n < 12 || memcmp(p, "BAM\x01", 4) != 0) return false;
  uint32_t l_text = rd_u32(p + 4);
  size_t off = 8 + l_text;
  if (off + 4 > n) return false;
  int32_t n_ref = rd_i32(p + off); off += 4;
  for (int32_t i = 0; i < n_ref; i++) {
    uint32_t l_name = rd_u32(p + off); off += 4;
    std::string name((const char*)p + off, l_name - 1); off += l_name;
    int32_t l_ref = rd_i32(p + off); off += 4;
    bf.refs.emplace_back(name, l_ref);
  }
  bf.rec_off = off;
  return true;
}

// ---------- alignment expansion ----------

// CIGAR ops: MIDNSHP=X
static inline bool consumes_ref(int op) {
  return op == 0 || op == 2 || op == 3 || op == 7 || op == 8;
}
static inline bool consumes_qry(int op) {
  return op == 0 || op == 1 || op == 4 || op == 7 || op == 8;
}

struct TagStream {
  // outputs appended here
  std::vector<int64_t>* t_pos;
  std::vector<int32_t>* key;
  std::vector<int32_t>* read_start;  // index into t_pos where each read starts
  std::vector<int64_t>* aln_bounds;  // aln_t_s, aln_t_e per emitted read
  std::vector<int32_t>* delta = nullptr;  // b3 delta per tag (v2 API only)
  // reusable scratch (per-thread) to avoid per-record allocation
  std::vector<uint8_t> q_scratch, t_scratch;
};

// Expand + trim + emit the 3-mer key stream for one record.
// Returns true if the record survived all filters. `clip_flag_out` set when the
// alignment is clip-labeled (filter_alignseqs_by_clip input, main.rs:1796-1812).
static bool process_record(const BamRec& r, const uint8_t* tseq_codes,
                           int64_t tlen, int64_t min_map_qual,
                           int64_t min_read_len, int64_t min_map_len,
                           double min_map_fra, int64_t max_clip_len,
                           int64_t use_secondary, int64_t use_supplementary,
                           int trim_len, TagStream& out, bool* clip_flag_out) {
  if (r.flag & 0x404) return false;
  if ((int64_t)r.mapq <= min_map_qual) return false;
  bool secondary = r.flag & 0x100, supplementary = r.flag & 0x800;
  if (secondary && !use_secondary) return false;
  if (supplementary && !use_supplementary) return false;

  // read length from cigar incl hard clips (main.rs:1758)
  int64_t rlen = 0, ref_span = 0;
  for (uint32_t i = 0; i < r.n_cigar; i++) {
    uint32_t c = rd_u32(r.cigar + 4 * i);
    int op = c & 0xF; int64_t l = c >> 4;
    if (consumes_qry(op) || op == 5) rlen += l;
    if (consumes_ref(op)) ref_span += l;
  }
  if (rlen <= min_read_len) return false;
  int64_t mml = min_map_len;
  int64_t frac = (int64_t)((float)rlen * (float)min_map_fra);
  if (ref_span < (mml > frac ? mml : frac)) return false;

  // expand cigar into gapped code arrays (fill_with_cigar, main.rs:386-440)
  std::vector<uint8_t>& q_codes = out.q_scratch;
  std::vector<uint8_t>& t_codes = out.t_scratch;
  q_codes.clear();
  t_codes.clear();
  q_codes.reserve(rlen + 64);
  t_codes.reserve(rlen + 64);
  int64_t qs = 0, ts = r.pos;
  int64_t aln_q_s = 0, aln_q_e = 0;
  bool first = true;
  auto qcode = [&](int64_t i) {
    uint8_t b = r.seq4[i >> 1];
    return kSeq4ToCode[(i & 1) ? (b & 0xF) : (b >> 4)];
  };
  for (uint32_t i = 0; i < r.n_cigar; i++) {
    uint32_t c = rd_u32(r.cigar + 4 * i);
    int op = c & 0xF; int64_t l = c >> 4;
    if (op == 4) {  // soft clip
      qs += l;
      if (first) aln_q_s = qs; else aln_q_e = qs - l;
    } else if (op == 0 || op == 7 || op == 8) {
      for (int64_t k = 0; k < l; k++) { q_codes.push_back(qcode(qs + k)); }
      for (int64_t k = 0; k < l; k++) { t_codes.push_back(tseq_codes[ts + k]); }
      qs += l; ts += l;
    } else if (op == 1) {
      for (int64_t k = 0; k < l; k++) { q_codes.push_back(qcode(qs + k)); }
      t_codes.insert(t_codes.end(), l, 4);
      qs += l;
    } else if (op == 2) {
      q_codes.insert(q_codes.end(), l, 4);
      for (int64_t k = 0; k < l; k++) { t_codes.push_back(tseq_codes[ts + k]); }
      ts += l;
    } else if (op == 5) {
      // hard clip: ignored
    } else {
      return false;  // N/P unsupported (reference panics, main.rs:430-432)
    }
    first = false;
  }
  if (aln_q_e == 0) aln_q_e = qs;
  int64_t aln_t_s = r.pos;

  bool is_clip = aln_q_e - aln_q_s + max_clip_len < rlen;

  // trim to trim_len-match boundaries (main.rs:446-513)
  int64_t n = (int64_t)t_codes.size();
  int64_t shift = n, new_len = n;
  {
    int64_t j = 0;
    for (int64_t i = 0; i < n; i++) {
      if (t_codes[i] == q_codes[i]) { j++; if (j == trim_len) { shift = i + 1 - trim_len; break; } }
      else j = 0;
    }
    if (shift < n) {
      j = 0;
      for (int64_t i = n - 1; i >= 0; i--) {
        if (t_codes[i] == q_codes[i]) { j++; if (j == trim_len) { new_len = i + trim_len; break; } }
        else j = 0;
      }
      // aln_t_s advance = # t-consuming columns before shift
      for (int64_t i = 0; i < shift; i++) if (t_codes[i] != 4) aln_t_s++;
    }
  }
  if (shift >= n) return false;
  // aln_len uses the truncated length (reference truncates before the check)
  if ((new_len - shift) <= min_map_len) return false;

  *clip_flag_out = is_clip;

  // emit tag stream + 3-mer keys (get_align_tag + update_msas semantics,
  // main.rs:314-338, 576-589). Virtual heads: b1=(s-1,0,15), b2=(s-1,1,15).
  out.read_start->push_back((int32_t)out.t_pos->size());
  int64_t t_cur = aln_t_s, delta = 0;
  int64_t b1_t = aln_t_s - 1, b1_d = 0; uint32_t b1_q = 15;
  int64_t b2_t = aln_t_s - 1, b2_d = 1; uint32_t b2_q = 15;
  bool first_col = true;
  int64_t aln_t_e = aln_t_s;
  for (int64_t i = shift; i < new_len; i++) {
    uint8_t tb = t_codes[i], qb = q_codes[i];
    if (first_col) { t_cur = aln_t_s; delta = 0; first_col = false; }
    else if (tb == 4) { delta++; }
    else { delta = 0; t_cur++; }
    // kmer key: (b1.delta<<16)|(flags<<12)|(b1.q<<8)|(b2.q<<4)|b3.q
    // delta saturates at u16 so the >=2^14 overflow guard still fires
    uint32_t flags = ((b2_t == b1_t) ? 4u : 0u) | ((b2_t == t_cur) ? 1u : 0u);
    uint32_t b1d_sat = b1_d > 0xFFFF ? 0xFFFFu : (uint32_t)b1_d;
    uint32_t key = (b1d_sat << 16) | (flags << 12) | (b1_q << 8) |
                   (b2_q << 4) | (uint32_t)qb;
    out.t_pos->push_back(t_cur);
    out.key->push_back((int32_t)key);
    if (out.delta) out.delta->push_back((int32_t)delta);
    b1_t = b2_t; b1_d = b2_d; b1_q = b2_q;
    b2_t = t_cur; b2_d = delta; b2_q = qb;
    aln_t_e = t_cur;
  }
  out.aln_bounds->push_back(aln_t_s);
  out.aln_bounds->push_back(aln_t_e);
  return true;
}

}  // namespace

extern "C" {

// Opaque handle: decompressed BAM kept resident across per-contig calls.
void* np2_open(const char* bam_path) {
  init_tables();
  BamFile* bf = new BamFile();
  if (!inflate_file(bam_path, bf->raw) || !parse_bam_header(*bf)) {
    delete bf;
    return nullptr;
  }
  return bf;
}

void np2_close(void* handle) {
  delete static_cast<BamFile*>(handle);
}

// Filter + expand + trim + stream one contig's records from an open handle.
// Outputs written into caller buffers (sizes via *_cap, actual via *_n).
// Returns 0 on success, negative on error, 1 if a buffer was too small.
int np2_extract_contig_h(void* handle, int32_t want_tid,
                         const uint8_t* tseq_codes, int64_t tlen,
                         int64_t min_map_qual, int64_t min_read_len,
                         int64_t min_map_len, double min_map_fra,
                         int64_t max_clip_len, int64_t use_secondary,
                         int64_t use_supplementary, int64_t trim_len,
                         int64_t short_ref_len,
                         int64_t* t_pos_out, int32_t* key_out, int64_t stream_cap,
                         int64_t* stream_n,
                         int32_t* read_start_out, int64_t* aln_bounds_out,
                         uint8_t* clip_flag_out, int64_t reads_cap,
                         int64_t* reads_n) {
  init_tables();
  BamFile& bf = *static_cast<BamFile*>(handle);

  std::vector<int64_t> t_pos;
  std::vector<int32_t> key;
  std::vector<int32_t> read_start;
  std::vector<int64_t> aln_bounds;
  std::vector<uint8_t> clip_flags;
  TagStream ts{&t_pos, &key, &read_start, &aln_bounds};

  const uint8_t* p = bf.raw.d.data();
  size_t n = bf.raw.d.size();
  size_t off = bf.rec_off;
  int64_t prev_pos = -1;
  while (off + 4 <= n) {
    int32_t block = rd_i32(p + off); off += 4;
    if (off + (size_t)block > n) return -3;
    const uint8_t* q = p + off;
    off += block;
    BamRec r;
    r.tid = rd_i32(q);
    if (r.tid > want_tid) break;          // sorted: past our contig
    r.pos = rd_i32(q + 4);
    uint8_t l_rn = q[8];
    r.mapq = q[9];
    r.n_cigar = rd_u16(q + 12);
    r.flag = rd_u16(q + 14);
    r.l_seq = rd_i32(q + 16);
    r.cigar = q + 32 + l_rn;
    r.seq4 = r.cigar + 4 * r.n_cigar;
    if (r.tid != want_tid) continue;
    if (r.pos < prev_pos) return -4;      // unsorted (main.rs:1753-1756)
    prev_pos = r.pos;
    bool clip = false;
    bool kept = process_record(r, tseq_codes, tlen, min_map_qual, min_read_len,
                               min_map_len, min_map_fra, max_clip_len,
                               use_secondary, use_supplementary, (int)trim_len,
                               ts, &clip);
    if (kept) {
      if (clip && tlen < short_ref_len) {
        // short refs drop clipped alignments outright (main.rs:1806-1810):
        // roll back this read's emissions
        int64_t start = read_start.back();
        t_pos.resize(start);
        key.resize(start);
        read_start.pop_back();
        aln_bounds.resize(aln_bounds.size() - 2);
      } else {
        clip_flags.push_back(clip ? 1 : 0);
      }
    }
  }

  if ((int64_t)t_pos.size() > stream_cap) return 1;
  if ((int64_t)read_start.size() > reads_cap) return 1;
  memcpy(t_pos_out, t_pos.data(), t_pos.size() * 8);
  memcpy(key_out, key.data(), key.size() * 4);
  *stream_n = (int64_t)t_pos.size();
  memcpy(read_start_out, read_start.data(), read_start.size() * 4);
  memcpy(aln_bounds_out, aln_bounds.data(), aln_bounds.size() * 8);
  memcpy(clip_flag_out, clip_flags.data(), clip_flags.size());
  *reads_n = (int64_t)read_start.size();
  return 0;
}

// Path-based convenience wrapper (opens, extracts, closes).
int np2_extract_contig(const char* bam_path, int32_t want_tid,
                       const uint8_t* tseq_codes, int64_t tlen,
                       int64_t min_map_qual, int64_t min_read_len,
                       int64_t min_map_len, double min_map_fra,
                       int64_t max_clip_len, int64_t use_secondary,
                       int64_t use_supplementary, int64_t trim_len,
                       int64_t short_ref_len,
                       int64_t* t_pos_out, int32_t* key_out, int64_t stream_cap,
                       int64_t* stream_n,
                       int32_t* read_start_out, int64_t* aln_bounds_out,
                       uint8_t* clip_flag_out, int64_t reads_cap,
                       int64_t* reads_n) {
  void* h = np2_open(bam_path);
  if (!h) return -1;
  int rc = np2_extract_contig_h(
      h, want_tid, tseq_codes, tlen, min_map_qual, min_read_len, min_map_len,
      min_map_fra, max_clip_len, use_secondary, use_supplementary, trim_len,
      short_ref_len, t_pos_out, key_out, stream_cap, stream_n, read_start_out,
      aln_bounds_out, clip_flag_out, reads_cap, reads_n);
  np2_close(h);
  return rc;
}

// Number of references and their lengths (for contig lookup without pysam).
int np2_bam_refs(const char* bam_path, char* names_out, int64_t names_cap,
                 int64_t* lens_out, int64_t lens_cap, int64_t* n_refs) {
  BamFile bf;
  if (!inflate_file(bam_path, bf.raw)) return -1;
  if (!parse_bam_header(bf)) return -2;
  if ((int64_t)bf.refs.size() > lens_cap) return 1;
  int64_t pos = 0;
  for (size_t i = 0; i < bf.refs.size(); i++) {
    int64_t l = (int64_t)bf.refs[i].first.size();
    if (pos + l + 1 > names_cap) return 1;
    memcpy(names_out + pos, bf.refs[i].first.c_str(), l + 1);
    pos += l + 1;
    lens_out[i] = bf.refs[i].second;
  }
  *n_refs = (int64_t)bf.refs.size();
  return 0;
}

}  // extern "C"

// ---------- pileup aggregation (host hot path) ----------
// Input: N packed entries (win<<45 | col<<32 | key) — the per-window 3-mer
// observation stream (window-major). Output: dense slot tables in the
// reference's slot order (stable by (b3-delta, first occurrence); Msa::push +
// Msa::sort semantics, main.rs:193-229) + per-column coverage + overflow flags.

#include <algorithm>
#if defined(_OPENMP)
#include <parallel/algorithm>
#endif

namespace {
static inline int64_t b3d_of_key(int64_t key) {
  int64_t flags = (key >> 12) & 0xF;
  if ((flags & 0b0101) == 0b0101) return ((key >> 16) & 0xFFFF) + 2;
  return (flags & 1) ? 1 : 0;
}
}  // namespace

extern "C" {

// Returns 0 on success. Caller buffers: key_tab/cnt_tab i32[B*W*K],
// coverage/n_slots i32[B*W], overflow u8[B]; all zero/minus-one initialized by
// the callee.
int np2_aggregate(const uint64_t* packed, int64_t n,
                  int64_t B, int64_t W, int64_t K,
                  int32_t* key_tab, int32_t* cnt_tab,
                  int32_t* coverage, int32_t* n_slots, uint8_t* overflow) {
  std::fill(key_tab, key_tab + B * W * K, -1);
  std::fill(cnt_tab, cnt_tab + B * W * K, 0);
  std::fill(coverage, coverage + B * W, 0);
  std::fill(n_slots, n_slots + B * W, 0);
  std::fill(overflow, overflow + B, 0);

  std::vector<int64_t> idx(n);
  for (int64_t i = 0; i < n; i++) idx[i] = i;
  auto cmp = [packed](int64_t a, int64_t b) {
    if (packed[a] != packed[b]) return packed[a] < packed[b];
    return a < b;  // stable: first occurrence first
  };
#if defined(_OPENMP)
  __gnu_parallel::sort(idx.begin(), idx.end(), cmp);
#else
  std::sort(idx.begin(), idx.end(), cmp);
#endif

  struct Seg { int64_t key; int64_t first; int64_t count; int64_t b3d; };
  std::vector<Seg> col_segs;
  col_segs.reserve(64);

  int64_t i = 0;
  while (i < n) {
    // one (win, col) group at a time
    uint64_t wc = packed[idx[i]] >> 32;
    int64_t win = (int64_t)(wc >> 13);
    int64_t col = (int64_t)(wc & 0x1FFF);
    col_segs.clear();
    while (i < n && (packed[idx[i]] >> 32) == wc) {
      uint64_t v = packed[idx[i]];
      int64_t first = idx[i];
      int64_t cnt = 0;
      while (i < n && packed[idx[i]] == v) { cnt++; i++; }
      int64_t key = (int64_t)(v & 0xFFFFFFFFull);
      col_segs.push_back({key, first, cnt, b3d_of_key(key)});
    }
    if (win >= B || col >= W) {  // out-of-tier window -> host fallback
      if (win < B) overflow[win] = 1;
      continue;
    }
    // slot order: (b3d, first occurrence)
    std::stable_sort(col_segs.begin(), col_segs.end(),
                     [](const Seg& a, const Seg& b) {
                       if (a.b3d != b.b3d) return a.b3d < b.b3d;
                       return a.first < b.first;
                     });
    int64_t base = (win * W + col) * K;
    int64_t ns = 0;
    int64_t cov = 0;
    for (size_t s = 0; s < col_segs.size(); s++) {
      if (col_segs[s].b3d == 0) cov += col_segs[s].count;
      if ((int64_t)s < K) {
        key_tab[base + s] = (int32_t)col_segs[s].key;
        cnt_tab[base + s] = (int32_t)col_segs[s].count;
        ns++;
      } else {
        overflow[win] = 1;
      }
    }
    coverage[win * W + col] = (int32_t)cov;
    n_slots[win * W + col] = (int32_t)ns;
  }
  return 0;
}

}  // extern "C"

// ---------- v2 API: size-query extraction, stream sort, window stream,
// no-sort aggregation ----------
//
// The round-1 wrapper guessed output sizes and retried with doubled buffers on
// overflow, re-running the whole extraction (2x cost) and zeroing GB-scale
// numpy buffers each attempt. v2 extracts ONCE into handle-owned staging
// (np2_extract_begin, multi-threaded over records), then the caller allocates
// exact-size buffers and drains them (np2_extract_fetch).

namespace {

struct RecRange {
  const uint8_t* q;  // record payload (past the block-length u32)
};

// Parse the fixed prefix of a BAM record payload.
static inline void parse_rec(const uint8_t* q, BamRec& r) {
  r.tid = rd_i32(q);
  r.pos = rd_i32(q + 4);
  uint8_t l_rn = q[8];
  r.mapq = q[9];
  r.n_cigar = rd_u16(q + 12);
  r.flag = rd_u16(q + 14);
  r.l_seq = rd_i32(q + 16);
  r.cigar = q + 32 + l_rn;
  r.seq4 = r.cigar + 4 * r.n_cigar;
}

struct ThreadOut {
  std::vector<int64_t> t_pos;
  std::vector<int32_t> key;
  std::vector<int32_t> delta;
  std::vector<int32_t> read_start;
  std::vector<int64_t> aln_bounds;
  std::vector<uint8_t> clip;
};

}  // namespace

extern "C" {

// Extract one contig into handle staging (no output buffers, no retry).
// Returns 0 and writes sizes; negative on error.
int np2_extract_begin(void* handle, int32_t want_tid,
                      const uint8_t* tseq_codes, int64_t tlen,
                      int64_t min_map_qual, int64_t min_read_len,
                      int64_t min_map_len, double min_map_fra,
                      int64_t max_clip_len, int64_t use_secondary,
                      int64_t use_supplementary, int64_t trim_len,
                      int64_t short_ref_len, int64_t n_threads,
                      int64_t* stream_n, int64_t* reads_n) {
  init_tables();
  BamFile& bf = *static_cast<BamFile*>(handle);
  double t0 = np2_now();

  // pass A: locate this contig's records (cheap header-only scan)
  std::vector<const uint8_t*> recs;
  std::vector<int64_t> est;  // cumulative l_seq for load balancing
  const uint8_t* p = bf.raw.d.data();
  size_t n = bf.raw.d.size();
  size_t off = bf.rec_off;
  int64_t prev_pos = -1, est_sum = 0;
  while (off + 4 <= n) {
    int32_t block = rd_i32(p + off); off += 4;
    if (off + (size_t)block > n) return -3;
    const uint8_t* q = p + off;
    off += block;
    int32_t tid = rd_i32(q);
    if (tid > want_tid) break;  // sorted: past our contig
    if (tid != want_tid) continue;
    int32_t pos = rd_i32(q + 4);
    if (pos < prev_pos) return -4;  // unsorted (main.rs:1753-1756)
    prev_pos = pos;
    recs.push_back(q);
    est_sum += rd_i32(q + 16) + 64;
    est.push_back(est_sum);
  }

  NP2_T("begin: pass A (locate)", t0);
  t0 = np2_now();
  int T = (int)(n_threads < 1 ? 1 : (n_threads > 16 ? 16 : n_threads));
  if ((int64_t)recs.size() < 4 * T) T = 1;
  std::vector<ThreadOut> touts(T);
  // range split balanced by cumulative l_seq
  std::vector<size_t> bounds(T + 1, recs.size());
  bounds[0] = 0;
  for (int t = 1; t < T; t++) {
    int64_t want = est_sum / T * t;
    size_t lo = bounds[t - 1], hi = recs.size();
    while (lo < hi) { size_t m = (lo + hi) / 2; if (est[m] < want) lo = m + 1; else hi = m; }
    bounds[t] = lo;
  }

  auto work = [&](int t) {
    ThreadOut& o = touts[t];
    size_t lo = bounds[t], hi = bounds[t + 1];
    int64_t cap = (lo < hi) ? (est[hi - 1] - (lo ? est[lo - 1] : 0)) : 0;
    o.t_pos.reserve(cap);
    o.key.reserve(cap);
    o.delta.reserve(cap);
    TagStream ts{&o.t_pos, &o.key, &o.read_start, &o.aln_bounds, &o.delta};
    for (size_t i = lo; i < hi; i++) {
      BamRec r;
      parse_rec(recs[i], r);
      bool clip = false;
      bool kept = process_record(r, tseq_codes, tlen, min_map_qual,
                                 min_read_len, min_map_len, min_map_fra,
                                 max_clip_len, use_secondary, use_supplementary,
                                 (int)trim_len, ts, &clip);
      if (!kept) continue;
      if (clip && tlen < short_ref_len) {
        // short refs drop clipped alignments outright (main.rs:1806-1810)
        int64_t start = o.read_start.back();
        o.t_pos.resize(start);
        o.key.resize(start);
        o.delta.resize(start);
        o.read_start.pop_back();
        o.aln_bounds.resize(o.aln_bounds.size() - 2);
      } else {
        o.clip.push_back(clip ? 1 : 0);
      }
    }
  };
  if (T == 1) {
    work(0);
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < T; t++) threads.emplace_back(work, t);
    for (auto& th : threads) th.join();
  }
  NP2_T("begin: process_record", t0);
  t0 = np2_now();

  // merge in record order (deterministic: same stream as the sequential pass)
  int64_t total_s = 0, total_r = 0;
  for (auto& o : touts) { total_s += (int64_t)o.t_pos.size(); total_r += (int64_t)o.read_start.size(); }
  bf.st_t_pos.resize(total_s);
  bf.st_key.resize(total_s);
  bf.st_delta.resize(total_s);
  bf.st_read_start.resize(total_r);
  bf.st_aln_bounds.resize(2 * total_r);
  bf.st_clip.resize(total_r);
  int64_t so = 0, ro = 0;
  for (auto& o : touts) {
    memcpy(bf.st_t_pos.data() + so, o.t_pos.data(), o.t_pos.size() * 8);
    memcpy(bf.st_key.data() + so, o.key.data(), o.key.size() * 4);
    memcpy(bf.st_delta.data() + so, o.delta.data(), o.delta.size() * 4);
    for (size_t i = 0; i < o.read_start.size(); i++)
      bf.st_read_start[ro + (int64_t)i] = o.read_start[i] + (int32_t)so;
    memcpy(bf.st_aln_bounds.data() + 2 * ro, o.aln_bounds.data(),
           o.aln_bounds.size() * 8);
    memcpy(bf.st_clip.data() + ro, o.clip.data(), o.clip.size());
    so += (int64_t)o.t_pos.size();
    ro += (int64_t)o.read_start.size();
  }
  *stream_n = total_s;
  *reads_n = total_r;
  NP2_T("begin: merge", t0);
  return 0;
}

// Drain staged extraction into exact-size caller buffers.
int np2_extract_fetch(void* handle, int64_t* t_pos_out, int32_t* key_out,
                      int32_t* delta_out, int32_t* read_start_out,
                      int64_t* aln_bounds_out, uint8_t* clip_flag_out) {
  BamFile& bf = *static_cast<BamFile*>(handle);
  memcpy(t_pos_out, bf.st_t_pos.data(), bf.st_t_pos.size() * 8);
  memcpy(key_out, bf.st_key.data(), bf.st_key.size() * 4);
  memcpy(delta_out, bf.st_delta.data(), bf.st_delta.size() * 4);
  memcpy(read_start_out, bf.st_read_start.data(), bf.st_read_start.size() * 4);
  memcpy(aln_bounds_out, bf.st_aln_bounds.data(), bf.st_aln_bounds.size() * 8);
  memcpy(clip_flag_out, bf.st_clip.data(), bf.st_clip.size());
  std::vector<int64_t>().swap(bf.st_t_pos);
  std::vector<int32_t>().swap(bf.st_key);
  std::vector<int32_t>().swap(bf.st_delta);
  std::vector<int32_t>().swap(bf.st_read_start);
  std::vector<int64_t>().swap(bf.st_aln_bounds);
  std::vector<uint8_t>().swap(bf.st_clip);
  return 0;
}

// Stable counting-sort of the (t_pos, key, rid) stream by t_pos.
// O(n + n_pos); replaces numpy's stable argsort (the round-1 plan_windows
// bottleneck at Mb scale). Also returns max(key>>16) for the delta-overflow
// guard (build_window_batch).
int np2_sort_stream(const int64_t* t_pos, const int32_t* key,
                    const int32_t* rid, int64_t n, int64_t n_pos,
                    int64_t* t_out, int32_t* k_out, int32_t* rid_out,
                    int64_t* max_b1d) {
  std::vector<int64_t> cnt(n_pos + 1, 0);
  int64_t mb = 0;
  for (int64_t i = 0; i < n; i++) {
    int64_t t = t_pos[i];
    if (t < 0 || t >= n_pos) return -1;
    cnt[t + 1]++;
    int64_t d = (int64_t)(((uint32_t)key[i]) >> 16);
    if (d > mb) mb = d;
  }
  for (int64_t t = 0; t < n_pos; t++) cnt[t + 1] += cnt[t];
  for (int64_t i = 0; i < n; i++) {
    int64_t p = cnt[t_pos[i]]++;
    t_out[p] = t_pos[i];
    k_out[p] = key[i];
    rid_out[p] = rid[i];
  }
  *max_b1d = mb;
  return 0;
}

// Build the window-major flat (win, col, key) stream from the t-sorted global
// stream: window w takes entries [lo[w], hi[w]) with col = t - lead[w].
// Output offsets are the cumulative (hi - lo); caller sizes buffers to the sum.
int np2_window_stream(const int64_t* t_sorted, const int32_t* k_sorted,
                      int64_t n, const int64_t* lo, const int64_t* hi,
                      const int64_t* lead, int64_t nw,
                      int32_t* flat_win, int32_t* flat_col, int32_t* flat_key) {
  std::vector<int64_t> off(nw + 1, 0);
  for (int64_t w = 0; w < nw; w++) off[w + 1] = off[w] + (hi[w] - lo[w]);
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t w = 0; w < nw; w++) {
    int64_t o = off[w];
    int64_t ld = lead[w];
    for (int64_t i = lo[w]; i < hi[w]; i++, o++) {
      flat_win[o] = (int32_t)w;
      flat_col[o] = (int32_t)(t_sorted[i] - ld);
      flat_key[o] = k_sorted[i];
    }
  }
  return 0;
}

// No-sort pileup aggregation over the PRE-GROUPED window-major stream
// (np2_window_stream output: win nondecreasing, col nondecreasing within win,
// in-column order = first-occurrence order). Each (win, col) group's segments
// are collected with a small open-address hash, then stable-sorted by b3-delta
// — the reference slot order (Msa::push + Msa::sort, main.rs:193-229) without
// the global indirect sort np2_aggregate paid (the per-chunk cost driver).
int np2_aggregate2(const int32_t* flat_win, const int32_t* flat_col,
                   const int32_t* flat_key, int64_t n, int64_t win0,
                   int64_t B, int64_t W, int64_t K,
                   int32_t* key_tab, int32_t* cnt_tab,
                   int32_t* coverage, int32_t* n_slots, uint8_t* overflow) {
  std::fill(key_tab, key_tab + B * W * K, -1);
  std::fill(cnt_tab, cnt_tab + B * W * K, 0);
  std::fill(coverage, coverage + B * W, 0);
  std::fill(n_slots, n_slots + B * W, 0);
  std::fill(overflow, overflow + B, 0);

  int T = 4;
  if (n < (int64_t)1 << 16) T = 1;
  // split on window boundaries: thread t starts at the first entry of the
  // first window >= its share
  std::vector<int64_t> tb(T + 1, n);
  tb[0] = 0;
  for (int t = 1; t < T; t++) {
    int64_t i = n / T * t;
    int32_t wv = flat_win[i];
    while (i > 0 && flat_win[i - 1] == wv) i--;
    tb[t] = i;
  }
  for (int t = 1; t < T; t++) if (tb[t] < tb[t - 1]) tb[t] = tb[t - 1];

  std::vector<int> err(T, 0);
  auto work = [&](int t) {
    struct Seg { int64_t key, first, count, b3d; };
    std::vector<Seg> segs;
    segs.reserve(256);
    // open-address hash: key -> seg index, generation-tagged
    const int HB = 9, HN = 1 << HB;
    int32_t hkey[HN];
    int32_t hseg[HN];
    uint32_t hgen[HN];
    memset(hgen, 0, sizeof(hgen));
    uint32_t gen = 0;
    int64_t i = tb[t], end = tb[t + 1];
    while (i < end) {
      int32_t win = flat_win[i], col = flat_col[i];
      int64_t wr = (int64_t)win - win0;
      segs.clear();
      gen++;
      int64_t j = i;
      for (; j < end && flat_win[j] == win && flat_col[j] == col; j++) {
        int32_t k = flat_key[j];
        uint32_t h = ((uint32_t)k * 2654435761u) >> (32 - HB);
        for (;;) {
          if (hgen[h] != gen) {
            hgen[h] = gen;
            hkey[h] = k;
            hseg[h] = (int32_t)segs.size();
            segs.push_back({(int64_t)(uint32_t)k, j, 1, b3d_of_key((int64_t)(uint32_t)k)});
            break;
          }
          if (hkey[h] == k) { segs[hseg[h]].count++; break; }
          h = (h + 1) & (HN - 1);
        }
      }
      i = j;
      if (wr < 0 || wr >= B) { err[t] = -2; return; }
      if (col >= (int32_t)W) { overflow[wr] = 1; continue; }
      std::stable_sort(segs.begin(), segs.end(),
                       [](const Seg& a, const Seg& b) { return a.b3d < b.b3d; });
      int64_t base = (wr * W + col) * K;
      int64_t ns = 0, cov = 0;
      for (size_t s = 0; s < segs.size(); s++) {
        if (segs[s].b3d == 0) cov += segs[s].count;
        if ((int64_t)s < K) {
          key_tab[base + (int64_t)s] = (int32_t)segs[s].key;
          cnt_tab[base + (int64_t)s] = (int32_t)segs[s].count;
          ns++;
        } else {
          overflow[wr] = 1;
        }
      }
      coverage[wr * W + col] = (int32_t)cov;
      n_slots[wr * W + col] = (int32_t)ns;
    }
  };
  if (T == 1) {
    work(0);
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < T; t++) threads.emplace_back(work, t);
    for (auto& th : threads) th.join();
  }
  for (int t = 0; t < T; t++) if (err[t]) return err[t];
  return 0;
}

}  // extern "C"
