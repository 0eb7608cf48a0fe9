"""Library design: native seqint kernel, count tables, probe design.

Behavior targets: reference library_tools/C_Tools/seqint.pyx (2-bit
packing) and library_tools/design.py (countTable, probe picking).
"""

import numpy as np
import pytest

from imageanalysis3_tpu import library as LB


def _ref_seq2int(seq):
    lut = {"A": 0, "C": 1, "G": 2, "T": 3}
    v = 0
    for ch in seq.upper():
        v = (v << 2) | lut.get(ch, 0)
    return v


def test_seq2int_matches_reference_lut():
    for seq in ["A", "ACGT", "TTTTGGGGCCCCAAAA", "acgtACGT",
                "GATTACAGATTACAGAT"]:
        assert LB.seq2int(seq) == _ref_seq2int(seq)
        assert LB.seq2int_rc(seq) == _ref_seq2int(
            LB.reverse_complement(seq))


def test_native_kernel_builds():
    # g++ is baked into the image; the native path must be live
    assert LB.native_available()


def test_seq_to_kmer_ints_rolling():
    seq = "ACGTACGTTGCA"
    word = 5
    fw, rc = LB.seq_to_kmer_ints(seq, word)
    assert len(fw) == len(seq) - word + 1
    for i in range(len(fw)):
        sub = seq[i:i + word]
        assert int(fw[i]) == _ref_seq2int(sub)
        assert int(rc[i]) == _ref_seq2int(LB.reverse_complement(sub))


def test_kmer_count_table_dense_and_sparse():
    seq = "ACGTACGTACGT"
    for sparse in (False, True):
        t = LB.KmerCountTable(word=4, sparse=sparse)
        t.consume(seq, count_rc=False)
        counts = t.count_sequence("ACGT")
        # 'ACGT' occurs 3 times in the circularly repeating sequence
        assert counts[0] == 3
        zero = t.count_sequence("AAAA")
        assert zero[0] == 0


def test_design_probes_avoids_offtargets():
    rng = np.random.default_rng(0)
    bases = np.array(list("ACGT"))
    region = "".join(rng.choice(bases, 400))
    # genome containing a repeated copy of region[100:160]
    repeat = region[100:160]
    genome = "".join(rng.choice(bases, 2000)) + repeat * 20
    ot = LB.KmerCountTable(word=12)
    ot.consume(genome)
    rep = LB.design_probes(region, probe_len=40, n_probes=6,
                           gc_range=(0.1, 0.9), tm_range=(0, 200),
                           offtarget_table=ot, max_offtarget_hits=5)
    assert len(rep.probes) >= 3
    # no picked probe contains any 12-mer of the repeated segment
    # (repeat 12-mers start in [100, 148]; a probe of length 40 contains
    # 12-mer starts [start, start+28])
    for p in rep.probes:
        assert p.max_offtarget <= 5
        assert p.start + 28 < 100 or p.start > 148, p.start
    # probes don't overlap each other
    starts = rep.starts
    assert (np.diff(starts) >= 40).all()


def test_assemble_and_check():
    targets = ["ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT",
               "GGCCGGCCGGCCGGCCGGCCGGCCAATTAATTAATTAATT"]
    readouts = ["AAACCC", "GGGTTT", "CCCAAA"]
    oligos = LB.assemble_probes(targets, readouts, fwd_primer="TTTT",
                                rev_primer="GGGG",
                                n_readouts_per_probe=2)
    assert oligos[0].startswith("TTTT" + "AAACCC" + "GGGTTT")
    assert oligos[0].endswith(targets[0] + "CCCC")
    keep = LB.check_probes(["ACGT" * 10, "AAAAAAAAAA" + "ACGT" * 8])
    assert keep[0]
    assert not keep[1]          # homopolymer run
