// pandaseq_tpu native host IO: paired FASTQ decoding straight into the
// batch tensors the TPU pipeline consumes.
//
// TPU-native equivalent of the reference's L1/L2 C stack (linebuf.c,
// fileio.c, fastq.c, seqid.c): instead of handing one read pair at a time
// to a per-pair assembler, it fills [batch, stride] int8 nt/qual arrays
// (plus lengths and canonical id strings) for the batched device step.
// Grammar and quirks are kept bit-compatible:
//   * nt table lookup on (ch & 0x1F), decode stops at max_len
//     (fastq.c:61-66)
//   * TOINDEX qual clamp incl. the above-range quirk (fastq.c:44)
//   * '+' separator check distinguishing READLEN vs BADSEQ (fastq.c:72-81)
//   * qual/seq length equality, zero-length NODATA skip (fastq.c:94-100)
//   * persistent per-stream decode buffers: bytes past the current length
//     keep the previous record's content (fastq.c:33-36; the PEAR
//     algorithm reads this stale data, algo_pear.c:52-54)
//   * id pairing + direction check (fastq.c:127-148), 4 header dialects
//     (seqid.c:157-284), CASAVA 1.7 => PHRED+33 assumed
// Compression: magic-byte sniff, zlib for gz/plain, libbz2 for bz2
// (fileio.c:60-98).
//
// Exposed as a plain C ABI consumed through ctypes (io/native.py).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>

#include <zlib.h>

// libbz2 prototypes (dev header not installed; ABI of libbz2.so.1)
extern "C" {
typedef void BZFILE;
BZFILE *BZ2_bzdopen(int fd, const char *mode);
int BZ2_bzread(BZFILE *b, void *buf, int len);
int BZ2_bzclose_(BZFILE *b);
void BZ2_bzclose(BZFILE *b);
}

namespace {

constexpr int MAX_LEN = 450;      // configure.ac:8
constexpr int PHREDMAX = 46;      // prob.h:22
constexpr int TAG_LEN = 50;       // pandaseq-common.h:45
constexpr int FIELD_LEN = 100;

// IUPAC tables indexed by (ch & 0x1F) (nt.c:46-114)
int8_t IUPAC_FWD[32];
int8_t IUPAC_REV[32];

struct InitTables {
    InitTables() {
        memset(IUPAC_FWD, 0, sizeof IUPAC_FWD);
        memset(IUPAC_REV, 0, sizeof IUPAC_REV);
        const struct { char c; int fwd; } t[] = {
            {'A', 1},  {'C', 2},  {'G', 4},  {'T', 8},  {'U', 8},
            {'M', 3},  {'R', 5},  {'W', 9},  {'S', 6},  {'Y', 10},
            {'K', 12}, {'V', 7},  {'H', 11}, {'D', 13}, {'B', 14},
            {'N', 15}, {'X', 15},
        };
        auto comp = [](int b) {  // complement of the 4-bit code (nt.c:27)
            int r = 0;
            if (b & 1) r |= 8;   // A -> T
            if (b & 8) r |= 1;   // T -> A
            if (b & 2) r |= 4;   // C -> G
            if (b & 4) r |= 2;   // G -> C
            return r;
        };
        for (auto &e : t) {
            IUPAC_FWD[e.c & 0x1F] = (int8_t) e.fwd;
            IUPAC_REV[e.c & 0x1F] = (int8_t) comp(e.fwd);
        }
    }
} init_tables_;

// ---------------------------------------------------------------------
// Buffered reader over gz / bz2 / plain with CR-stripping line scanner
// (linebuf.c:57-89)
// ---------------------------------------------------------------------
struct Stream {
    gzFile gz = nullptr;
    BZFILE *bz = nullptr;
    char buf[1 << 16];
    int buf_len = 0, buf_pos = 0;
    bool eof = false;
    std::string line;

    bool open(const char *path) {
        FILE *probe = fopen(path, "rb");
        if (!probe) return false;
        unsigned char magic[3] = {0, 0, 0};
        size_t got = fread(magic, 1, 3, probe);
        fclose(probe);
        if (got >= 3 && magic[0] == 'B' && magic[1] == 'Z') {
            FILE *f = fopen(path, "rb");
            if (!f) return false;
            bz = BZ2_bzdopen(fileno(f), "rb");
            return bz != nullptr;
        }
        gz = gzopen(path, "rb");  // zlib handles plain + gzip
        if (gz) gzbuffer(gz, 1 << 17);
        return gz != nullptr;
    }
    int raw_read(char *dst, int n) {
        if (gz) return gzread(gz, dst, n);
        if (bz) {
            int r = BZ2_bzread(bz, dst, n);
            return r < 0 ? 0 : r;
        }
        return 0;
    }
    // next line without trailing \n / \r\n; nullptr at EOF
    const char *next_line() {
        line.clear();
        for (;;) {
            if (buf_pos >= buf_len) {
                if (eof) break;
                buf_len = raw_read(buf, sizeof buf);
                buf_pos = 0;
                if (buf_len <= 0) {
                    eof = true;
                    break;
                }
            }
            char *nl = (char *) memchr(buf + buf_pos, '\n',
                                       buf_len - buf_pos);
            if (nl) {
                line.append(buf + buf_pos, nl - (buf + buf_pos));
                buf_pos = (int) (nl - buf) + 1;
                if (!line.empty() && line.back() == '\r') line.pop_back();
                return line.c_str();
            }
            line.append(buf + buf_pos, buf_len - buf_pos);
            buf_pos = buf_len;
        }
        if (line.empty()) return nullptr;
        if (!line.empty() && line.back() == '\r') line.pop_back();
        return line.c_str();
    }
    void close() {
        if (gz) gzclose(gz);
        if (bz) BZ2_bzclose(bz);
        gz = nullptr;
        bz = nullptr;
    }
};

// ---------------------------------------------------------------------
// Sequence id parsing (seqid.c:143-285)
// ---------------------------------------------------------------------
struct SeqId {
    char instrument[FIELD_LEN + 4];
    char run[FIELD_LEN + 4];
    char flowcell[FIELD_LEN + 4];
    int lane = 0, tile = 0, x = 0, y = 0;
    char tag[TAG_LEN + 4];

    void clear() {
        instrument[0] = run[0] = flowcell[0] = tag[0] = '\0';
        lane = tile = x = y = 0;
    }
    bool equal(const SeqId &o) const {
        return lane == o.lane && tile == o.tile && x == o.x && y == o.y &&
               !strcmp(instrument, o.instrument) && !strcmp(run, o.run) &&
               !strcmp(flowcell, o.flowcell) && !strcmp(tag, o.tag);
    }
    int print(char *dst, int cap) const {  // panda_seqid_xprint format
        return snprintf(dst, cap, "%s:%s:%s:%d:%d:%d:%d:%s", instrument,
                        run, flowcell, lane, tile, x, y, tag);
    }
};

inline bool is_sep(char c) {
    return c == ':' || c == '#' || c == '/' || c == ' ';
}

struct Cursor {
    const char *p;
    bool parse_int(int *out) {
        if (*p == '\0') return false;
        int v = 0;
        for (; *p != '\0' && !is_sep(*p); p++) {
            if (*p < '0' || *p > '9') return false;
            v = 10 * v + (*p - '0');
        }
        *out = v;
        return true;
    }
    bool parse_str(char *dst, size_t cap) {
        if (*p == '\0') return false;
        size_t n = 0;
        for (; *p != '\0' && !is_sep(*p); p++) {
            if (n > cap) return false;
            dst[n++] = *p;
        }
        dst[n] = '\0';
        return true;
    }
    bool push() {
        if (*p == '\0') return false;
        p++;
        return true;
    }
};

// policy: 0 = optional, 1 = absent, 2 = present (matches io/fastq.py)
enum Policy { TAG_OPTIONAL = 0, TAG_ABSENT = 1, TAG_PRESENT = 2 };

int seqid_parse(SeqId *id, const char *input, int policy,
                bool *has_direction, bool *casava17) {
    id->clear();
    *has_direction = true;
    *casava17 = false;
    Cursor c{input};
    size_t len = strlen(input);
    int value;

    if (len > 3 && (input[0] == 'E' || input[0] == 'S') &&
        input[1] == 'R' && input[2] == 'R') {
        // Short Read Archive (seqid.c:157-172)
        *has_direction = false;
        c.p += 3;
        // PARSE_SRA_INT: digits until '.' or ' '
        int v = 0;
        for (; *c.p != '\0' && *c.p != '.' && *c.p != ' '; c.p++) {
            if (*c.p < '0' || *c.p > '9') return 0;
            v = 10 * v + (*c.p - '0');
        }
        if (!c.push()) return 0;
        snprintf(id->instrument, sizeof id->instrument, "%cRR%d", input[0],
                 v);
        v = 0;
        for (; *c.p != '\0' && *c.p != '.' && *c.p != ' '; c.p++) {
            if (*c.p < '0' || *c.p > '9') return 0;
            v = 10 * v + (*c.p - '0');
        }
        if (!c.push()) return 0;
        id->lane = v;
        if (!c.push()) return 0;
        return 1;
    }
    if (strchr(input, '/') != nullptr) {
        // CASAVA 1.4-1.6 or converted 1.7 (seqid.c:174-238)
        size_t colon_count = 0;
        for (const char *q = input; *q != '\0' && *q != '#'; q++)
            if (*q == ':') colon_count++;
        if (colon_count == 6) {
            if (!c.parse_str(id->instrument, FIELD_LEN) || !c.push())
                return 0;
            if (!c.parse_str(id->run, FIELD_LEN) || !c.push()) return 0;
            if (!c.parse_str(id->flowcell, FIELD_LEN) || !c.push())
                return 0;
        } else {
            if (!c.parse_str(id->instrument, FIELD_LEN) || !c.push())
                return 0;
        }
        if (!c.parse_int(&id->lane) || !c.push()) return 0;
        if (!c.parse_int(&id->tile) || !c.push()) return 0;
        if (!c.parse_int(&id->x) || !c.push()) return 0;
        if (!c.parse_int(&id->y) || !c.push()) return 0;
        if (*(c.p - 1) == '#') {
            size_t n = 0;
            for (; *c.p != '\0' && !is_sep(*c.p); c.p++) {
                if (n >= TAG_LEN) return 0;
                id->tag[n++] = *c.p;
            }
            id->tag[n] = '\0';
            if (!c.push()) return 0;
        }
        if (policy != TAG_OPTIONAL &&
            policy != (id->tag[0] == '\0' ? TAG_ABSENT : TAG_PRESENT))
            return 0;
        if (!c.parse_int(&value)) return 0;
        return value;
    }
    // CASAVA 1.7+ (seqid.c:240-284)
    *casava17 = true;
    if (!c.parse_str(id->instrument, FIELD_LEN) || !c.push()) return 0;
    if (!c.parse_str(id->run, FIELD_LEN) || !c.push()) return 0;
    if (!c.parse_str(id->flowcell, FIELD_LEN) || !c.push()) return 0;
    if (!c.parse_int(&id->lane) || !c.push()) return 0;
    if (!c.parse_int(&id->tile) || !c.push()) return 0;
    if (!c.parse_int(&id->x) || !c.push()) return 0;
    if (!c.parse_int(&id->y) || !c.push()) return 0;
    int mate;
    if (!c.parse_int(&mate) || !c.push()) return 0;
    if (*c.p == '\0') return 0;  // filtered chunk must exist
    while (*c.p != '\0' && !is_sep(*c.p)) c.p++;
    if (!c.push()) return 0;
    if (!c.parse_int(&value) || !c.push()) return 0;  // control bits
    size_t n = 0;
    for (; *c.p != '\0' && !is_sep(*c.p); c.p++) {
        if (n >= TAG_LEN) return 0;
        id->tag[n++] = *c.p;
    }
    id->tag[n] = '\0';
    if (policy != TAG_OPTIONAL &&
        policy != (id->tag[0] == '\0' ? TAG_ABSENT : TAG_PRESENT))
        return 0;
    return mate;
}

// ---------------------------------------------------------------------
// Paired reader
// ---------------------------------------------------------------------
const char NT_ASCII[17] = "NACMGRSVTWYHKDBN";

struct PairReader {
    Stream fwd, rev, idx;
    bool has_index = false;
    int qualmin = 33;
    int policy = TAG_PRESENT;
    // persistent decode buffers (fastq.c:33-36)
    int8_t fwd_nt[MAX_LEN], fwd_q[MAX_LEN];
    int8_t rev_nt[MAX_LEN], rev_q[MAX_LEN];
    bool seen_under_64 = false;
    bool non_empty = false;
    int error = 0;  // error codes below

    PairReader() {
        memset(fwd_nt, 0, sizeof fwd_nt);
        memset(fwd_q, 0, sizeof fwd_q);
        memset(rev_nt, 0, sizeof rev_nt);
        memset(rev_q, 0, sizeof rev_q);
    }
};

enum ErrCode {
    ERR_NONE = 0,
    ERR_EOF = 1,
    ERR_BADID = 2,
    ERR_NOTPAIRED = 3,
    ERR_BADNT = 4,
    ERR_BADSEQ = 5,
    ERR_READLEN = 6,
    ERR_NOQUAL = 7,
};

inline int toindex(int v, int qualmin) {  // fastq.c:44
    if (v < qualmin) return 0;
    return (v > qualmin + PHREDMAX ? PHREDMAX : v) - qualmin;
}

// read_seq (fastq.c:45-104); returns length or -error
int read_seq(Stream &s, const int8_t *table, int8_t *nt_buf, int8_t *q_buf,
             int max_len, int qualmin, bool *seen_under_64) {
    const char *input = s.next_line();
    if (input == nullptr) return -ERR_EOF;
    int pos = 0;
    for (; *input != '\0' && pos < max_len; input++) {
        int8_t code = table[*input & 0x1F];
        if (code == 0) return -ERR_BADNT;
        nt_buf[pos++] = code;
    }
    input = s.next_line();
    if (input == nullptr) return -ERR_EOF;
    if (*input != '+')
        return table[*input & 0x1F] != 0 ? -ERR_READLEN : -ERR_BADSEQ;
    input = s.next_line();
    if (input == nullptr) return -ERR_EOF;
    int qpos = 0;
    for (; *input != '\0'; input++) {
        if (*input < 64) *seen_under_64 = true;
        if (qpos < max_len) q_buf[qpos] = (int8_t) toindex(
            (unsigned char) *input, qualmin);
        qpos++;
    }
    if (qpos != pos) return -ERR_NOQUAL;
    return pos;  // pos == 0 -> NODATA handled by caller
}

}  // namespace

extern "C" {

void *psq_open_pair(const char *fwd_path, const char *rev_path, int qualmin,
                    int policy, const char *index_path) {
    PairReader *r = new PairReader();
    r->qualmin = qualmin;
    r->policy = policy;
    if (!r->fwd.open(fwd_path) || !r->rev.open(rev_path)) {
        delete r;
        return nullptr;
    }
    if (index_path != nullptr && index_path[0] != 0) {
        if (!r->idx.open(index_path)) {
            delete r;
            return nullptr;
        }
        r->has_index = true;
    }
    return r;
}

// Fill up to `batch` pairs. Arrays are [batch, stride] int8 (stride >=
// MAX_LEN); ids is [batch, id_stride] bytes receiving the canonical
// "instrument:run:flowcell:lane:tile:x:y:tag" string. Returns the number
// of pairs produced; sets *error when the stream terminated on a
// malformed record (treated as end-of-stream, assembler.c:356-358).
long psq_next_batch(void *handle, long batch, long stride, int8_t *fwd_nt,
                    int8_t *fwd_q, int8_t *rev_nt, int8_t *rev_q,
                    int32_t *flen, int32_t *rlen, char *ids,
                    long id_stride, int32_t *error) {
    PairReader *r = (PairReader *) handle;
    long n = 0;
    *error = r->error;
    if (r->error) return 0;
    while (n < batch) {
        const char *line = r->fwd.next_line();
        if (line == nullptr) break;  // clean EOF
        SeqId fid, rid;
        bool fdir_known, rdir_known, f17, r17;
        int fdir = seqid_parse(&fid, line + 1, r->policy, &fdir_known,
                               &f17);
        if (fdir == 0) {
            r->error = ERR_BADID;
            break;
        }
        line = r->rev.next_line();
        if (line == nullptr) break;
        int rdir = seqid_parse(&rid, line + 1, r->policy, &rdir_known,
                               &r17);
        if (rdir == 0) {
            r->error = ERR_BADID;
            break;
        }
        if (!fid.equal(rid) || (fdir_known && rdir == fdir)) {
            r->error = ERR_NOTPAIRED;
            break;
        }
        if (f17) r->seen_under_64 = true;
        int fl = read_seq(r->fwd, IUPAC_FWD, r->fwd_nt, r->fwd_q, MAX_LEN,
                          r->qualmin, &r->seen_under_64);
        if (fl < 0) {
            r->error = -fl;
            break;
        }
        int rl = read_seq(r->rev, IUPAC_REV, r->rev_nt, r->rev_q, MAX_LEN,
                          r->qualmin, &r->seen_under_64);
        if (rl < 0) {
            r->error = -rl;
            break;
        }
        if (r->has_index) {  // barcode read becomes the tag (fastq.c:159-188)
            const char *iline = r->idx.next_line();
            if (iline == nullptr) break;
            SeqId iid;
            bool idir_known, i17;
            int idir = seqid_parse(&iid, iline + 1, r->policy, &idir_known,
                                   &i17);
            if (idir == 0) {
                r->error = ERR_BADID;
                break;
            }
            if (!fid.equal(iid)) {
                r->error = ERR_NOTPAIRED;
                break;
            }
            int8_t tag_nt[TAG_LEN], tag_q[TAG_LEN];
            int tl = read_seq(r->idx, IUPAC_FWD, tag_nt, tag_q, TAG_LEN - 1,
                              r->qualmin, &r->seen_under_64);
            if (tl < 0) {
                r->error = -tl;
                break;
            }
            for (int t = 0; t < tl; t++)
                fid.tag[t] = NT_ASCII[tag_nt[t] & 0x0F];
            fid.tag[tl] = 0;
        }
        r->non_empty = true;
        if (fl == 0) continue;  // NODATA: skip record (fastq.c:191)

        int8_t *dst = fwd_nt + n * stride;
        memcpy(dst, r->fwd_nt, MAX_LEN);
        memset(dst + MAX_LEN, 0, stride - MAX_LEN);
        dst = fwd_q + n * stride;
        memcpy(dst, r->fwd_q, MAX_LEN);
        memset(dst + MAX_LEN, 0, stride - MAX_LEN);
        dst = rev_nt + n * stride;
        memcpy(dst, r->rev_nt, MAX_LEN);
        memset(dst + MAX_LEN, 0, stride - MAX_LEN);
        dst = rev_q + n * stride;
        memcpy(dst, r->rev_q, MAX_LEN);
        memset(dst + MAX_LEN, 0, stride - MAX_LEN);
        flen[n] = fl;
        rlen[n] = rl;
        fid.print(ids + n * id_stride, (int) id_stride);
        n++;
    }
    *error = r->error;
    return n;
}

int psq_stream_flags(void *handle) {
    PairReader *r = (PairReader *) handle;
    return (r->seen_under_64 ? 1 : 0) | (r->non_empty ? 2 : 0);
}

void psq_close(void *handle) {
    PairReader *r = (PairReader *) handle;
    r->fwd.close();
    r->rev.close();
    r->idx.close();
    delete r;
}

// Exact mean-quality finalization (assembler.c:161-244): per merged base
// the device ships pidx = case*2209 + fq*47 + rq (case|quals provenance);
// the per-algorithm f64 table ptbl maps pidx -> log p. The C reference
// accumulates three region sums (forward copy, overlap, reverse copy) in
// position order and computes (f + r + o) / (len + 1) — reproduced here
// bit-for-bit in one pass, replacing three [B, L2] float64 cumsums.
void psq_quality(const int32_t *seq, long B, long L2, const double *ptbl,
                 const int32_t *seq_len, double *quality) {
    for (long b = 0; b < B; b++) {
        const int32_t *row = seq + b * L2;
        double fsum = 0.0, osum = 0.0, rsum = 0.0;
        for (long j = 0; j < L2; j++) {
            int32_t pidx = row[j] & 0xFFFF;
            int cse = pidx / 2209;
            double p = ptbl[pidx];
            if (cse == 1) fsum += p;
            else if (cse == 2) rsum += p;
            else if (cse >= 3) osum += p;
        }
        quality[b] = (fsum + rsum + osum) / (double) (seq_len[b] + 1);
    }
}

// Primer-location accumulation (offset.c:70-88 hot loop): A[b, s] sums
// the per-base alignment contributions of a primer starting at s, in
// ascending primer-position order — the same f64 accumulation order as
// the reference's circular buffer (and the numpy slice-add fallback).
void psq_primer_align(const int8_t *nt, const double *p, const double *np_,
                      long B, long S, const int8_t *primer, long plen,
                      double *A) {
    for (long b = 0; b < B; b++) {
        const int8_t *ntr = nt + b * S;
        const double *pr = p + b * S;
        const double *npr = np_ + b * S;
        double *Ar = A + b * S;
        for (long s = 0; s < S; s++) Ar[s] = 0.0;
        for (long x = 0; x < plen; x++) {
            int px = primer[x] & 0x0F;
            if (px == 0x0F) continue;  // N contributes nothing
            long W = S - x;
            for (long s = 0; s < W; s++) {
                Ar[s] += (ntr[s + x] & px) ? pr[s + x] : npr[s + x];
            }
        }
    }
}

}  // extern "C"
