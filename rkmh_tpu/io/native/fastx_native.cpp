// Native FASTA/FASTQ parser + 2-bit packer (C ABI, loaded via ctypes).
//
// TPU-native replacement for the reference's kseq.hpp streaming parser and
// KSEQ_Reader buffered batch reader (SURVEY.md §2.1 rows 6-7): instead of
// yielding one record at a time to a thread pool, it parses the whole file
// (gzip or plain, detected by magic bytes like io/fastx.py) and emits the
// exact device-ready layout the JAX pipeline consumes:
//
//   codes [n, pad_len] uint8   2-bit codes A=0 C=1 G=2 T=3, invalid/pad=255/4
//   lens  [n] int32            true sequence lengths
//   names / seqs / quals       concatenated raw bytes + offset tables
//                              (seqs uppercased; quals empty for FASTA)
//
// Semantics match rkmh_tpu.io.fastx exactly (the Python parser is the
// oracle): names are the header token up to the first whitespace, sequences
// are uppercased at parse time (rkmh.cpp:227 to_upper-at-parse), multi-line
// FASTA is concatenated, FASTQ is name/seq/+/qual.
//
// Build: g++ -O3 -march=native -shared -fPIC fastx_native.cpp -o librkmh_io.so -lz

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>
#include <string>
#include <zlib.h>

namespace {

struct Record {
    size_t name_off, name_len;
    size_t seq_off, seq_len;    // offsets into the uppercased seq blob
    size_t qual_off, qual_len;
};

// byte -> 2-bit code (case-insensitive); 4 = invalid base
uint8_t CODE_LUT[256];
uint8_t UPPER_LUT[256];
struct LutInit {
    LutInit() {
        for (int i = 0; i < 256; ++i) {
            CODE_LUT[i] = 4;
            UPPER_LUT[i] = (i >= 'a' && i <= 'z') ? uint8_t(i - 32) : uint8_t(i);
        }
        const char* b = "ACGT";
        for (int i = 0; i < 4; ++i) {
            CODE_LUT[(uint8_t)b[i]] = uint8_t(i);
            CODE_LUT[(uint8_t)(b[i] + 32)] = uint8_t(i);
        }
    }
} lut_init;

bool read_whole_file(const char* path, std::vector<uint8_t>& out) {
    gzFile f = gzopen(path, "rb");  // transparently handles plain files too
    if (!f) return false;
    gzbuffer(f, 1 << 20);
    const size_t CHUNK = 1 << 22;
    size_t used = 0;
    for (;;) {
        out.resize(used + CHUNK);
        int got = gzread(f, out.data() + used, CHUNK);
        if (got < 0) { gzclose(f); return false; }
        used += size_t(got);
        if (got == 0) break;
    }
    out.resize(used);
    gzclose(f);
    return true;
}

}  // namespace

extern "C" {

typedef struct {
    int64_t n;
    int64_t pad_len;
    uint8_t* codes;      // n * pad_len
    int32_t* lens;       // n
    char* names;         // concatenated
    int64_t* name_offs;  // n + 1
    char* seqs;          // concatenated (uppercased)
    int64_t* seq_offs;   // n + 1
    char* quals;         // concatenated ('\0'-free; empty slices for FASTA)
    int64_t* qual_offs;  // n + 1
} RkmhBatch;

void rkmh_free(RkmhBatch* b) {
    if (!b) return;
    free(b->codes); free(b->lens);
    free(b->names); free(b->name_offs);
    free(b->seqs);  free(b->seq_offs);
    free(b->quals); free(b->qual_offs);
    memset(b, 0, sizeof(*b));
}

// Parse one FASTA/FASTQ file into a packed batch.
// granularity: pad_len rounds the max sequence length up to this multiple.
// Returns 0 on success, nonzero on error.
int rkmh_read_fastx(const char* path, int64_t granularity, RkmhBatch* out) {
    memset(out, 0, sizeof(*out));
    std::vector<uint8_t> buf;
    if (!read_whole_file(path, buf)) return 1;

    std::vector<Record> recs;
    std::string names, seqs, quals;
    names.reserve(1 << 16);
    seqs.reserve(buf.size());

    size_t i = 0, n = buf.size();
    auto skip_eol = [&](size_t& p) {
        while (p < n && (buf[p] == '\n' || buf[p] == '\r')) ++p;
    };
    auto line_end = [&](size_t p) {
        while (p < n && buf[p] != '\n' && buf[p] != '\r') ++p;
        return p;
    };

    while (i < n) {
        skip_eol(i);
        if (i >= n) break;
        uint8_t c = buf[i];
        if (c != '>' && c != '@') return 2;  // malformed
        bool fastq = (c == '@');
        size_t he = line_end(i);
        // name: token up to first whitespace after the marker
        size_t ns = i + 1, ne = ns;
        while (ne < he && buf[ne] != ' ' && buf[ne] != '\t') ++ne;
        Record r{};
        r.name_off = names.size();
        r.name_len = ne - ns;
        names.append((const char*)buf.data() + ns, ne - ns);
        i = he;
        skip_eol(i);

        r.seq_off = seqs.size();
        if (fastq) {
            size_t se = line_end(i);
            for (size_t p = i; p < se; ++p) seqs.push_back((char)UPPER_LUT[buf[p]]);
            i = se; skip_eol(i);
            r.qual_off = quals.size();
            if (i < n && buf[i] == '+') {           // separator line
                i = line_end(i); skip_eol(i);
                size_t qe = line_end(i);
                quals.append((const char*)buf.data() + i, qe - i);
                i = qe;
            }
            r.qual_len = quals.size() - r.qual_off;
        } else {
            while (i < n && buf[i] != '>' && buf[i] != '@') {
                size_t se = line_end(i);
                for (size_t p = i; p < se; ++p) seqs.push_back((char)UPPER_LUT[buf[p]]);
                i = se; skip_eol(i);
            }
            r.qual_off = quals.size();
            r.qual_len = 0;
        }
        r.seq_len = seqs.size() - r.seq_off;
        recs.push_back(r);
    }

    int64_t N = (int64_t)recs.size();
    int64_t max_len = 0;
    for (auto& r : recs) if ((int64_t)r.seq_len > max_len) max_len = r.seq_len;
    int64_t g = granularity > 0 ? granularity : 1;
    int64_t pad = ((max_len + g - 1) / g) * g;
    if (pad < g) pad = g;

    out->n = N;
    out->pad_len = pad;
    out->codes = (uint8_t*)malloc(size_t(N) * size_t(pad));
    out->lens = (int32_t*)malloc(size_t(N) * sizeof(int32_t));
    out->names = (char*)malloc(names.size() ? names.size() : 1);
    out->name_offs = (int64_t*)malloc((N + 1) * sizeof(int64_t));
    out->seqs = (char*)malloc(seqs.size() ? seqs.size() : 1);
    out->seq_offs = (int64_t*)malloc((N + 1) * sizeof(int64_t));
    out->quals = (char*)malloc(quals.size() ? quals.size() : 1);
    out->qual_offs = (int64_t*)malloc((N + 1) * sizeof(int64_t));
    if (!out->codes || !out->lens || !out->names || !out->name_offs ||
        !out->seqs || !out->seq_offs || !out->quals || !out->qual_offs) {
        rkmh_free(out);
        return 3;
    }

    memset(out->codes, 255, size_t(N) * size_t(pad));  // PAD_CODE
    memcpy(out->names, names.data(), names.size());
    memcpy(out->seqs, seqs.data(), seqs.size());
    memcpy(out->quals, quals.data(), quals.size());

    int64_t noff = 0, soff = 0, qoff = 0;
    for (int64_t j = 0; j < N; ++j) {
        const Record& r = recs[j];
        out->name_offs[j] = noff; noff += (int64_t)r.name_len;
        out->seq_offs[j] = soff;  soff += (int64_t)r.seq_len;
        out->qual_offs[j] = qoff; qoff += (int64_t)r.qual_len;
        out->lens[j] = (int32_t)r.seq_len;
        uint8_t* row = out->codes + size_t(j) * size_t(pad);
        const char* sp = seqs.data() + r.seq_off;
        for (size_t p = 0; p < r.seq_len; ++p) row[p] = CODE_LUT[(uint8_t)sp[p]];
    }
    out->name_offs[N] = noff;
    out->seq_offs[N] = soff;
    out->qual_offs[N] = qoff;
    return 0;
}

}  // extern "C"
