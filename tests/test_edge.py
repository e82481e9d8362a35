"""Edge-case robustness: inputs the reference handles (or declares)
must not crash the CLI, and unmappable reads come out as unmapped
records."""

import io
import os
import sys

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")


def _run(args):
    from minialign_tpu import cli
    out = io.StringIO()
    old = sys.stdout
    sys.stdout = out
    try:
        rc = cli.main(args)
    finally:
        sys.stdout = old
    return rc, out.getvalue()


def test_empty_query_file(tmp_path):
    q = tmp_path / "empty.fq"
    q.write_text("")
    rc, out = _run(["-t1", f"{DATA}/tref.fa", str(q)])
    assert rc == 0
    assert all(l.startswith("@") for l in out.splitlines())


def test_reads_shorter_than_k(tmp_path):
    q = tmp_path / "short.fq"
    q.write_text("@tiny\nACGTACGT\n+\nIIIIIIII\n")
    rc, out = _run(["-t1", f"{DATA}/tref.fa", str(q)])
    assert rc == 0
    recs = [l for l in out.splitlines() if not l.startswith("@")]
    assert len(recs) == 1 and recs[0].split("\t")[1] == "4"  # unmapped


def test_n_bases_and_whitespace(tmp_path):
    ref = tmp_path / "r.fa"
    seq = "".join("ACGT"[i % 4] for i in range(400))
    ref.write_text(f">r desc\n{seq[:200]}\n\n{seq[200:]}\n")
    q = tmp_path / "q.fa"
    q.write_text(f">q\nNNN{seq[50:150]}NNNN\n")
    rc, out = _run(["-t1", "-s20", str(ref), str(q)])
    assert rc == 0
    recs = [l for l in out.splitlines() if not l.startswith("@")]
    assert len(recs) >= 1


def test_unmappable_read(tmp_path):
    rng = np.random.default_rng(1)
    q = tmp_path / "rand.fq"
    s = "".join("ACGT"[i] for i in rng.integers(0, 4, 500))
    q.write_text(f"@noise\n{s}\n+\n{'I' * len(s)}\n")
    rc, out = _run(["-t1", f"{DATA}/tref.fa", str(q)])
    assert rc == 0
    recs = [l for l in out.splitlines() if not l.startswith("@")]
    assert recs and recs[0].split("\t")[1] == "4"


def test_crlf_and_multiline_fastq(tmp_path):
    q = tmp_path / "crlf.fq"
    body = ("@r1 c\r\n" + "ACGT" * 30 + "\r\n" + "ACGT" * 10 + "\r\n"
            + "+\r\n" + "I" * 120 + "\r\n" + "J" * 40 + "\r\n")
    q.write_bytes(body.encode())
    from minialign_tpu.io import bseq
    seqs = list(bseq.read_seqs(str(q), keep_qual=True))
    assert len(seqs) == 1
    assert len(seqs[0].codes) == 160
    assert seqs[0].qual == b"I" * 120 + b"J" * 40


def test_min_len_filter(tmp_path):
    q = tmp_path / "mix.fq"
    q.write_text("@a\nACGTACGTACGTACGTACGT\n+\n" + "I" * 20 + "\n"
                 "@b\nACG\n+\nIII\n")
    from minialign_tpu.io import bseq
    assert len(list(bseq.read_seqs(str(q), min_len=10))) == 1
