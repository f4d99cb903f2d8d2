"""Demultiplexed FASTQ output with the reference's exact naming and headers.

Re-implements ``print_all`` (``io.c:757-1016``):

* output-file set = (#barcodes, or 2 when no barcode segment) x (#R-segments
  summed over input files), named ``<p>_BC_<seq>[_READ<n>].fq`` /
  ``<p>[_READ<n>].fq`` / ``<p>_un[_READ<n>].fq`` (``io.c:857-915``);
* reads route by merged outcome + decoded barcode; the un-file is the last
  alternative;
* extracted sequences are stored with 65-valued spacers; each maximal
  spacer-free run goes to the next READ file in sequence (``io.c:946-996``);
* headers are ``@<name>[;FP:<key|seq>];RQ:<q>`` with the per-file read's own
  mapq (``io.c:959-994``; ``get_finger_seq``, ``io.c:1018-1029``);
* refuses to start if outputs exist (``io.c:633-691``).
"""

from __future__ import annotations

import os
from typing import List, Optional

from ..arch import ReadStructure
from ..constants import ALPHABET, EXTRACT_SUCCESS


def finger_seq(key: int) -> str:
    """get_finger_seq (io.c:1018-1029)."""
    length = key & 0xFF
    key >>= 8
    out = [""] * length
    for i in range(length):
        out[length - i - 1] = "ACGTN"[key & 0x3]
        key >>= 2
    return "".join(out)


def existing_output_files(
    outfile: str, rs: ReadStructure, num_reads: int, multiread: int
) -> List[str]:
    """check_for_existing_demultiplexed_files_multiple (io.c:633-691)."""
    found = []
    barseg = rs.barcode_segment()
    if barseg != -1:
        for i in range(rs.numseq_in_segment(barseg) - 1):
            if num_reads > 1:
                for j in range(num_reads):
                    p = f"{outfile}_BC_{rs.seqs[barseg][i]}_READ{j + 1}.fq"
                    if os.path.exists(p):
                        found.append(p)
            else:
                p = f"{outfile}_BC_{rs.seqs[barseg][i]}.fq"
                if os.path.exists(p):
                    found.append(p)
    else:
        if multiread == 2:
            for j in range(num_reads):
                p = f"{outfile}_READ{j + 1}.fq"
                if os.path.exists(p):
                    found.append(p)
        else:
            p = f"{outfile}.fq"
            if os.path.exists(p):
                found.append(p)
    if multiread == 2:
        for j in range(num_reads):
            p = f"{outfile}_un_READ{j + 1}.fq"
            if os.path.exists(p):
                found.append(p)
    else:
        p = f"{outfile}_un.fq"
        if os.path.exists(p):
            found.append(p)
    return found


class DemuxWriter:
    """Holds the open per-(read-slot, alternative) file handles across
    batches; file layout mirrors io.c:861-915."""

    def __init__(
        self,
        outfile: str,
        rs: ReadStructure,
        read_present: List[int],
        print_seq_finger: bool = False,
    ):
        self.outfile = outfile
        self.rs = rs
        self.read_present = read_present
        self.print_seq_finger = print_seq_finger
        self.num_out_reads = sum(read_present)
        barseg = rs.barcode_segment()
        if barseg != -1:
            self.num_alternatives = rs.numseq_in_segment(barseg)
            bar_matrix = rs.seqs[barseg]
        else:
            self.num_alternatives = 2
            bar_matrix = None
        if self.num_out_reads == 0:
            raise SystemExit(
                "ERROR: No output files to create. Input sequences may not "
                "contain extractable reads or may not match the expected "
                "architecture."
            )
        names = []
        if bar_matrix is not None:
            if self.num_out_reads > 1:
                for i in range(self.num_out_reads):
                    for j in range(self.num_alternatives - 1):
                        names.append(f"{outfile}_BC_{bar_matrix[j]}_READ{i + 1}.fq")
                    names.append(f"{outfile}_un_READ{i + 1}.fq")
            else:
                for j in range(self.num_alternatives - 1):
                    names.append(f"{outfile}_BC_{bar_matrix[j]}.fq")
                names.append(f"{outfile}_un.fq")
        else:
            if self.num_out_reads > 1:
                for i in range(self.num_out_reads):
                    names.append(f"{outfile}_READ{i + 1}.fq")
                    names.append(f"{outfile}_un_READ{i + 1}.fq")
            else:
                names.append(f"{outfile}.fq")
                names.append(f"{outfile}_un.fq")
        self.files = [open(n, "w") for n in names]

    def write_batch(self, read_info_container, numseq: int) -> None:
        """read_info_container[file][i] like the reference; routing uses
        file 0's merged read_type/barcode (io.c:923-1001)."""
        n_alt = self.num_alternatives
        for i in range(numseq):
            c = 0
            r0 = read_info_container[0][i]
            for j in range(len(self.read_present)):
                if self.read_present[j]:
                    if r0.read_type == EXTRACT_SUCCESS:
                        if r0.barcode != -1:
                            f = c + (r0.barcode & 0xFF)
                        else:
                            f = c
                    else:
                        f = c + n_alt - 1
                    tmp = read_info_container[j][i]
                    self._write_read(tmp, f)
                c += n_alt * self.read_present[j]

    def _write_read(self, r, f: int) -> None:
        seq = r.seq
        qual = r.qual
        out_seq = []
        out_qual = []
        files = self.files
        for g in range(r.len):
            v = int(seq[g])
            if v < 5:
                out_seq.append(ALPHABET[v])
                out_qual.append(qual[g] if qual is not None else ".")
            else:
                if out_seq:
                    self._emit(files[f], r, out_seq, out_qual)
                    f += self.num_alternatives
                    out_seq = []
                    out_qual = []
        if out_seq:
            self._emit(files[f], r, out_seq, out_qual)

    def _emit(self, fh, r, out_seq, out_qual) -> None:
        if r.fingerprint != -1:
            if self.print_seq_finger:
                fh.write(f"@{r.name};FP:{finger_seq(r.fingerprint)};RQ:{r.mapq:.2f}\n")
            else:
                fh.write(f"@{r.name};FP:{r.fingerprint};RQ:{r.mapq:.2f}\n")
        else:
            fh.write(f"@{r.name};RQ:{r.mapq:.2f}\n")
        fh.write("".join(out_seq))
        fh.write("\n+\n")
        fh.write("".join(out_qual))
        fh.write("\n")

    def close(self) -> None:
        for f in self.files:
            f.close()
