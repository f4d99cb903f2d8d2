"""ctypes bindings for the native FASTQ codec (csrc/fastq_codec.cpp).

Opt-in fast path for the streaming reader (``TAGDUST_TPU_FAST_IO=1`` or
``SeqReader(path, fast=True)``); produces Read objects identical to the
Python line-state parser for well-formed FASTQ/FASTA (asserted by tests).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "..", "csrc", "fastq_codec.cpp")
_SO = os.path.join(_HERE, "_fastq_codec.so")

_lib = None


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True,
        )
    lib = ctypes.CDLL(_SO)
    lib.td_parse_fastq.restype = ctypes.c_long
    _lib = lib
    return lib


class FastParser:
    """Streaming chunked parser over a byte stream (already decompressed)."""

    def __init__(self, stream, is_fasta: bool = False, bufsize: int = 8 << 20):
        self.stream = stream
        self.is_fasta = is_fasta
        self.bufsize = bufsize
        self.tail = b""
        self.eof = False
        self.lib = get_lib()

    def read_records(self, max_records: int):
        """Returns (names list[str], seq arrays list[np.uint8], quals list[str])."""
        from .fastq import Read

        out: List[Read] = []
        lib = self.lib
        while len(out) < max_records:
            if not self.tail and self.eof:
                break
            # refill
            while (not self.eof) and len(self.tail) < self.bufsize:
                chunk = self.stream.read(self.bufsize)
                if not chunk:
                    self.eof = True
                    break
                self.tail += chunk
            buf = self.tail
            if not buf:
                break
            n = len(buf)
            want = max_records - len(out)
            name_off = np.zeros(want, dtype=np.int64)
            name_len = np.zeros(want, dtype=np.int32)
            arena = np.zeros(n, dtype=np.uint8)
            seq_off = np.zeros(want, dtype=np.int64)
            seq_len = np.zeros(want, dtype=np.int32)
            qual_off = np.zeros(want, dtype=np.int64)
            qual_len = np.zeros(want, dtype=np.int32)
            consumed = ctypes.c_long(0)
            rec = lib.td_parse_fastq(
                buf,
                ctypes.c_long(n),
                ctypes.c_long(want),
                ctypes.c_int(1 if self.eof else 0),
                name_off.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
                name_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                arena.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.c_long(n),
                seq_off.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
                seq_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                qual_off.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
                qual_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                ctypes.byref(consumed),
            )
            if rec < 0:
                raise SystemExit(
                    "ERROR: Length of sequence and base qualities differ!."
                )
            for i in range(rec):
                no, nl = int(name_off[i]), int(name_len[i])
                so, sl = int(seq_off[i]), int(seq_len[i])
                qo, ql = int(qual_off[i]), int(qual_len[i])
                out.append(
                    Read(
                        name=buf[no : no + nl].decode("ascii", "replace"),
                        seq=arena[so : so + sl].copy(),
                        qual=buf[qo : qo + ql].decode("ascii", "replace")
                        if ql
                        else None,
                    )
                )
            if consumed.value == 0:
                if self.eof:
                    break
                # buffer too small for one record: grow
                self.bufsize *= 2
                continue
            self.tail = buf[consumed.value :]
            if rec == 0 and self.eof:
                break
        return out
