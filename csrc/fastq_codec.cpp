// Native FASTQ codec: fast parse/encode of FASTQ buffers into flat arrays.
//
// The reference outsources decompression to child processes and parses with
// per-line fgets (io.c:459-606, :1684-1815); the Python fallback in
// tagdust_tpu.io.fastq mirrors that line-state machine.  This codec is the
// hot-path replacement: one pass over a raw buffer producing
//   - name offsets/lengths into the buffer,
//   - 0-5 nucleotide codes written into a flat uint8 arena,
//   - qual offsets (into the buffer) and per-record lengths,
// using the same record grammar (header '@'/'>' when expecting one, '+'
// separator, single-line sequences).

#include <cstdint>
#include <cstring>

namespace {
uint8_t NUC[256];
bool nuc_init_done = false;
void nuc_init() {
    if (nuc_init_done) return;
    for (int i = 0; i < 256; i++) NUC[i] = 4;
    NUC['.'] = 5;
    NUC['A'] = 0; NUC['a'] = 0;
    NUC['C'] = 1; NUC['c'] = 1;
    NUC['G'] = 2; NUC['g'] = 2;
    NUC['T'] = 3; NUC['t'] = 3;
    NUC['U'] = 3; NUC['u'] = 3;
    nuc_init_done = true;
}
}  // namespace

extern "C" {

// Parse up to max_records FASTQ records from buf[0..n).
// Returns number of records parsed; *consumed = bytes consumed (so callers
// can stream chunks: unconsumed tail carries to the next call).
// Outputs (all arrays sized max_records unless noted):
//   name_off/name_len: header byte ranges (after '@')
//   seq_arena: 0-5 codes, concatenated; seq_off/seq_len index into it
//   qual_off/qual_len: quality byte ranges in buf (len 0 = absent)
long td_parse_fastq(const char* buf, long n, long max_records, int at_eof,
                    long* name_off, int* name_len, uint8_t* seq_arena,
                    long seq_arena_cap, long* seq_off, int* seq_len,
                    long* qual_off, int* qual_len, long* consumed) {
    nuc_init();
    long pos = 0;
    long rec = 0;
    long arena = 0;
    long last_complete = 0;
    while (pos < n && rec < max_records) {
        // find header
        if (buf[pos] != '@' && buf[pos] != '>') {
            // skip stray line
            while (pos < n && buf[pos] != '\n') pos++;
            if (pos < n) pos++;
            continue;
        }
        // Truncated records at EOF are emitted partially (header-only, or
        // seq without qual) exactly like the line-state parser the
        // reference uses (io.c:1684-1815): a read is appended when its
        // header is seen, later lines only fill it in.
        bool fasta = buf[pos] == '>';
        long hstart = pos + 1;
        long p = hstart;
        while (p < n && buf[p] != '\n' && buf[p] != '\r') p++;
        if (p >= n && !at_eof) break;  // incomplete header: wait for data
        long hend = p;
        long sstart = p, send = p;
        long qstart = 0, qlen = 0;
        if (p < n) {
            while (p < n && (buf[p] == '\n' || buf[p] == '\r')) p++;
            // sequence line
            sstart = p;
            while (p < n && buf[p] != '\n' && buf[p] != '\r') p++;
            if (p >= n && !at_eof) break;
            send = p;
            while (p < n && (buf[p] == '\n' || buf[p] == '\r')) p++;
            long slen = send - sstart;
            if (!fasta && p < n) {
                if (buf[p] != '+') break;
                while (p < n && buf[p] != '\n') p++;
                if (p >= n && !at_eof) break;
                if (p < n) {
                    p++;
                    if (p >= n && !at_eof) break;  // qual not arrived yet
                    if (p < n) {  // a qual line exists (maybe empty)
                        qstart = p;
                        while (p < n && buf[p] != '\n' && buf[p] != '\r') p++;
                        if (p >= n && !at_eof) break;  // qual may be truncated
                        long qend = p;
                        if (qend - qstart != slen) {
                            // malformed; fail hard like the reference check
                            return -1;
                        }
                        qlen = qend - qstart;
                        while (p < n && (buf[p] == '\n' || buf[p] == '\r')) p++;
                    }
                    // else: EOF right after '+': qual never arrived -> absent
                }
            } else if (!fasta && !at_eof) {
                break;  // '+' line not arrived yet
            }
        }
        long slen = send - sstart;
        if (arena + slen > seq_arena_cap) break;
        name_off[rec] = hstart;
        name_len[rec] = (int)(hend - hstart);
        seq_off[rec] = arena;
        seq_len[rec] = (int)slen;
        for (long i = 0; i < slen; i++)
            seq_arena[arena + i] = NUC[(unsigned char)buf[sstart + i]];
        arena += slen;
        qual_off[rec] = qstart;
        qual_len[rec] = (int)qlen;
        rec++;
        pos = p;
        last_complete = p;
    }
    *consumed = last_complete;
    return rec;
}

// Decode 0-5 codes to ASCII (A C G T N N); 65 (spacer) -> 'N' is NOT mapped
// here: spacers are handled by the writer.
void td_decode_seq(const uint8_t* codes, long n, char* out) {
    static const char alpha[6] = {'A', 'C', 'G', 'T', 'N', 'N'};
    for (long i = 0; i < n; i++) out[i] = alpha[codes[i] > 5 ? 4 : codes[i]];
}

}  // extern "C"
