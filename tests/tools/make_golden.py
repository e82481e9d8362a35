"""Regenerate every committed tests/data/ref_* golden from the
reference binary (tests/data/README.md documents the mapping).

Usage:
    python tests/tools/make_golden.py [ref_binary] [--check]

Without a binary argument the reference tree is copied to /tmp/refbuild
and built with `make -j8` (plain gcc -O3 — the canonical release-build
behavior, see PARITY.md item 5). With --check the freshly generated
outputs are byte-compared against the committed goldens instead of
overwriting them; a non-zero exit means drift.

Input fixtures (tref.fa, treads.fq, ...) are committed and reused as
is; only derived inputs are rebuilt here:
  - treads.term.bam: treads.bam + the trailing u32 the reference's BAM
    reader needs to reach EOF (tests/data/README.md).
  - two.mai: two-block index built on the fly for ref_twoblock.sam.
"""

import os
import shutil
import subprocess
import sys

DATA = os.path.join(os.path.dirname(__file__), "..", "data")
REFSRC = "/root/reference"

# (output file, argv) — input paths are relative to tests/data; "%d/"
# expands to the scratch dir (for .mai intermediates). Commands match
# tests/data/README.md and the test docstrings in test_golden_sam.py.
GOLDENS = [
    ("ref_out.sam", ["-t1", "tref.fa", "treads.fq"]),
    ("ref_pacbio.sam", ["-t1", "-xpacbio", "tref.fa", "treads.fq"]),
    ("ref_tags.sam", ["-t1", "-TAS,NM,MD,XS,NH,IH", "tref.fa",
                      "treads.fq"]),
    ("ref_qual.sam", ["-t1", "-Q", "tref.fa", "treads.fq"]),
    ("ref_out.paf", ["-t1", "-Opaf", "tref.fa", "treads.fq"]),
    ("ref_out.maf", ["-t1", "-Omaf", "tref.fa", "treads.fq"]),
    ("ref_out.b6", ["-t1", "-Oblast6", "tref.fa", "treads.fq"]),
    ("ref_ava.paf", ["-t1", "-X", "-xava", "-Opaf", "treads.fa",
                     "treads2.fq"]),
    ("ref_ava_rg.sam", ["-t1", "-X", "-xava", "-R", "@RG\\tID:ava",
                        "treads.fa", "treads2.fq"]),
    ("ref_circ.sam", ["-t1", "-cplasmid", "cplas.fa", "creads.fq"]),
    ("ref_circ.paf", ["-t1", "-Opaf", "-cplasmid", "cplas.fa",
                      "creads.fq"]),
    ("ref_circ_tags.sam", ["-t1", "-cplasmid",
                           "-TAS,NM,MD,SA,XS,NH,IH", "cplas.fa",
                           "creads.fq"]),
    ("ref_bam.sam", ["-t1", "tref.fa", "%d/treads.term.bam"]),
    ("ref_bam_q.sam", ["-t1", "-Q", "tref.fa", "%d/treads.term.bam"]),
    ("ref_emod.sam", ["-t1", "-a2", "-b5", "-p5", "-q1", "-r3,3",
                      "-eGA+3", "tref.fa", "treads.fq"]),
    ("ref_ont1dsq_circ.sam", ["-t1", "-xont.1dsq", "-cplasmid",
                              "-TSA,MD", "cplas.fa", "creads.fq"]),
    ("ref_ont.sam", ["-t1", "-xont.r9.4.1d", "tref.fa", "treads.fq"]),
    ("ref_multi.sam", ["-t1", "mref.fa", "mreads.fq"]),
    ("ref_rep.sam", ["-t1", "-xpacbio", "repref.fa", "repreads.fq"]),
    # the four fuzzer-derived goldens were generated from the repo root
    # (tests/data/-prefixed paths in the @PG CL line); %r/ marks that
    ("ref_tie.sam", ["-t1", "-xpacbio.ccs", "%r/tieref.fa",
                     "%r/tiereads.fq"]),
    ("ref_xdrop.sam", ["-t1", "-a2", "-b1", "-p4", "-q2",
                       "-TAS,NM,XS,NH", "%r/xdref.fa", "%r/xdreads.fq"]),
    ("ref_circmaf.maf", ["-t1", "-a3", "-b4", "-p0", "-q2", "-m0.5",
                         "-cc0", "-Omaf", "cmref.fa", "cmreads.fq"]),
    ("ref_circsplit.sam", ["-t1", "-a3", "-b4", "-p0", "-q2", "-m0.5",
                           "-cc0", "%r/cmref.fa", "%r/cmreads.fq"]),
    ("ref_ksort.sam", ["-t1", "-a3", "-b2", "-p5", "-q2", "-r3,3",
                       "-s59", "-m0.2", "-k10", "-w3", "%r/ksref.fa",
                       "%r/ksreads.fq"]),
]


def build_reference():
    bld = "/tmp/refbuild"
    binpath = os.path.join(bld, "minialign")
    if not os.path.exists(binpath):
        if os.path.exists(bld):
            shutil.rmtree(bld)
        shutil.copytree(REFSRC, bld)
        subprocess.run(["make", "-j8"], cwd=bld, check=True,
                       stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL)
    return binpath


def make_term_bam(scratch):
    """treads.bam, gzip-wrapped with a trailing u32 appended so the
    reference BAM reader reaches EOF cleanly (minialign.c:1959-1966
    reads one extra block-length word; PARITY.md item 7). Not
    committed; regenerated here exactly as the goldens were made."""
    import gzip
    import struct
    out = os.path.join(scratch, "treads.term.bam")
    with gzip.open(os.path.join(DATA, "treads.bam"), "rb") as f:
        raw = f.read()
    with gzip.open(out, "wb") as f:
        f.write(raw + struct.pack("<I", 0xDEAD))
    return out


def run_one(binary, args, scratch):
    # run from tests/data with bare input filenames and /tmp scratch
    # paths: the @PG CL line echoes argv verbatim, and the committed
    # goldens were produced exactly this way
    # %r/ args run from the repo root with tests/data/ prefixes (the
    # fuzzer-derived goldens were generated that way); everything else
    # runs from tests/data with bare filenames
    root = any(a.startswith("%r/") for a in args)
    cwd = os.path.normpath(os.path.join(DATA, "..", "..")) if root \
        else DATA
    argv = [binary]
    for a in args:
        if a.startswith("%d/"):
            argv.append(os.path.join(scratch, a[3:]))
        elif a.startswith("%r/"):
            argv.append("tests/data/" + a[3:])
        else:
            argv.append(a)
    r = subprocess.run(argv, capture_output=True, cwd=cwd)
    # the term.bam cases exit 1 after printing all records (the
    # reference's BAM-EOF quirk, PARITY.md item 7) — accept any rc as
    # long as output was produced; --check still byte-compares it
    if r.returncode != 0 and not r.stdout:
        raise subprocess.CalledProcessError(r.returncode, argv,
                                            r.stdout, r.stderr)
    return r.stdout


def main(argv):
    check = "--check" in argv
    argv = [a for a in argv if a != "--check"]
    binary = argv[0] if argv else build_reference()
    scratch = "/tmp"
    make_term_bam(scratch)

    # two-block index for ref_twoblock.sam
    mai = os.path.join(scratch, "two.mai")
    subprocess.run([binary, "-d", mai, os.path.join(DATA, "tref.fa"),
                    os.path.join(DATA, "tref.fa")],
                   capture_output=True, check=True)
    cases = GOLDENS + [("ref_twoblock.sam", ["-t1", mai, "treads.fq"])]

    drift = 0
    for name, args in cases:
        out = run_one(binary, args, scratch)
        path = os.path.join(DATA, name)
        if check:
            want = open(path, "rb").read()
            ok = out == want
            print(f"{'ok  ' if ok else 'DIFF'} {name}")
            drift += 0 if ok else 1
        else:
            with open(path, "wb") as f:
                f.write(out)
            print(f"wrote {name} ({len(out)} bytes)")
    if check and drift:
        print(f"{drift} goldens drifted", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
