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


# ---------------------------------------------------------------------------
# Sequence/annotation readers (reference library_tools/{references,sequences})
# ---------------------------------------------------------------------------


def _toy_annotation(tmp_path):
    gff = tmp_path / "toy.gff3"
    gff.write_text("\n".join([
        "##gff-version 3",
        "##sequence-region chr1 1 2000",
        "chr1\tens\tgene\t101\t400\t.\t+\t.\tID=gene:G1;Name=MYGENE;"
        "biotype=protein_coding",
        "chr1\tens\tmRNA\t101\t400\t.\t+\t.\tID=transcript:T1;"
        "Parent=gene:G1",
        "chr1\tens\texon\t101\t160\t.\t+\t.\tParent=transcript:T1",
        "chr1\tens\texon\t201\t260\t.\t+\t.\tParent=transcript:T1",
        "chr1\tens\tmRNA\t101\t400\t.\t+\t.\tID=transcript:T2;"
        "Parent=gene:G1",
        "chr1\tens\texon\t101\t160\t.\t+\t.\tParent=transcript:T2",
        "chr1\tens\texon\t301\t400\t.\t+\t.\tParent=transcript:T2",
        "chr1\tens\tgene\t501\t700\t.\t-\t.\tID=gene:G2;Name=REVGENE",
        "chr1\tens\tmRNA\t501\t700\t.\t-\t.\tID=transcript:T3;"
        "Parent=gene:G2",
        "chr1\tens\texon\t501\t550\t.\t-\t.\tParent=transcript:T3",
        "chr1\tens\texon\t601\t700\t.\t-\t.\tParent=transcript:T3",
        "", ]))
    rng = np.random.default_rng(0)
    genome = {"chr1": "".join(rng.choice(list("ACGT"), 2000))}
    return str(gff), genome


def test_gff3_transcript_extraction(tmp_path):
    gff, genome = _toy_annotation(tmp_path)
    genes = LB.read_gff3(gff)
    assert set(genes) == {"G1", "G2"}
    g1 = genes["G1"]
    assert g1.name == "MYGENE" and g1.biotype == "protein_coding"
    assert set(g1.transcripts) == {"T1", "T2"}
    t1 = g1.transcripts["T1"]
    assert t1.exons == [(101, 160), (201, 260)]
    assert t1.length == 120
    seq = LB.extract_transcript_sequence(genome, t1)
    assert seq == genome["chr1"][100:160] + genome["chr1"][200:260]
    # '-' strand transcript: exons spliced then reverse-complemented
    t3 = genes["G2"].transcripts["T3"]
    seq3 = LB.extract_transcript_sequence(genome, t3)
    want = LB.reverse_complement(
        genome["chr1"][500:550] + genome["chr1"][600:700])
    assert seq3 == want


def test_isoform_coverage_flags(tmp_path):
    gff, _ = _toy_annotation(tmp_path)
    g1 = LB.read_gff3(gff)["G1"]
    flags, n_iso = LB.isoform_coverage_flags(g1)
    assert n_iso == 2
    assert flags[0] == 2                      # shared first exon
    assert flags[201 - 101] == 1              # T1-only exon
    assert flags[301 - 101] == 1              # T2-only exon
    assert flags[170 - 101] == 0              # intron in both


def test_parse_region_and_extraction():
    rec = LB.parse_region("chr21:28,212,120-28,268,614")
    assert rec == {"chr": "chr21", "start": 28212120, "end": 28268614}
    genome = {"chr2": "ACGTACGTAA"}
    assert LB.extract_region_sequence(genome, "chr2", 2, 5) == "CGTA"
    assert LB.extract_region_sequence(genome, "2", 2, 5, "-") == "TACG"


# ---------------------------------------------------------------------------
# Readout screens (reference library_tools/readouts.py)
# ---------------------------------------------------------------------------


def test_filter_readout_rules():
    # balanced 30-mer that passes every screen
    good = "TCGATCAGTACGATCGTAGCTAGCATGTCA"
    assert LB.filter_readout(good)
    # GC out of window
    assert not LB.filter_readout("A" * 15 + "T" * 15)
    # 4-base homorun
    assert not LB.filter_readout("TCGATCAGTAAAATCGTAGCTAGCATGTCA")
    # repeated internal 6-mer
    rep = "TCGATCAGTCGATCAGTACGTACGATGTCA"[:30]
    assert LB.has_repeated_kmer("ABCDEFABCDEF", 6)
    # C fraction clamp in first 12 bases
    assert not LB.filter_readout("TCCACCTCCGTACGATGATCGTAGCATGTA")
    # similarity to an existing readout (shared 12-run)
    shared = good[:12] + "GATCATGCAGTCATGCAG"[:18]
    assert not LB.filter_readout(shared, existing=[good], max_shared=10)
    # reverse-complement similarity also counts
    rc_hit = LB.reverse_complement(good[5:25])
    assert LB.max_shared_run(rc_hit, [good]) >= 20


def test_extend_and_search_candidates():
    rng = np.random.default_rng(3)
    out = LB.extend_readout("ACGTACGTACG", target_len=30, rng=rng)
    assert len(out) == 30 and out.endswith("ACGTACGTACG")
    assert out[0] in "AT" or out[-12] in "AT"
    # search: grow a mutually-dissimilar set from random pool
    pool = ["".join(rng.choice(list("ACGT"), 30)) for _ in range(400)]
    got = LB.search_candidates(pool, total_cand=5, max_shared=12)
    assert len(got) == 5
    for i, a in enumerate(got):
        for b in got[i + 1:]:
            assert LB.max_shared_run(a, [b]) <= 12


def test_genome_and_structure_screens():
    rng = np.random.default_rng(4)
    genome_seq = "".join(rng.choice(list("ACGT"), 4000))
    table = LB.KmerCountTable(word=12)
    table.consume(genome_seq)
    hot = genome_seq[100:130]                 # embedded in the genome
    cold = "".join(rng.choice(list("ACGT"), 30))
    keep = LB.screen_readouts_by_genome([hot, cold], table, max_hits=0)
    assert not keep[0]
    assert keep[1] or table.count_sequence(cold).max() > 0
    # structure: a perfect hairpin folds; a homopolymer-free random seq
    stem = "GCGCGCGCGC"
    hairpin = stem + "TTTT" + LB.reverse_complement(stem)
    assert LB.nussinov_max_pairs(hairpin) >= len(stem)
    keep2 = LB.screen_readouts_by_structure([hairpin, "ACTGAT" * 5],
                                            max_pair_fraction=0.5)
    assert not keep2[0]


def test_adaptors_and_channels():
    reads = ["ACGTACGTAC", "TGCATGCATG", "GGATCCGGAT"]
    ch = LB.split_readouts_into_channels(reads, num_channels=2)
    assert ch[0] == [reads[0], reads[2]] and ch[1] == [reads[1]]
    ad = LB.generate_adaptors(reads[:2], ["TTTTT", "AAAAA"])
    assert ad[0] == reads[0] + "AAAAA" * 2
    assert ad[1] == reads[1] + "TTTTT" * 2


def test_repeat_masked_probe_design():
    """Repeat-library k-mers and soft-masked windows are rejected
    (reference rep_map screening, library_tools/design.py:270-500)."""
    rng = np.random.default_rng(5)
    repeat = "".join(rng.choice(list("ACGT"), 60))
    clean_a = "".join(rng.choice(list("ACGT"), 150))
    clean_b = "".join(rng.choice(list("ACGT"), 150))
    region = clean_a + repeat + clean_b
    rep_table = LB.KmerCountTable(word=12)
    rep_table.consume(repeat)
    rep_free = LB.design_probes(region, probe_len=40, n_probes=20,
                                gc_range=(0.0, 1.0), tm_range=(0, 200),
                                repeat_table=rep_table, max_repeat_hits=0)
    for p in rep_free.probes:
        # no selected probe overlaps the repeat k-mers
        assert p.max_repeat == 0
        assert not (p.start + 40 > len(clean_a) + 11
                    and p.start < len(clean_a) + 60 - 11)
    # soft-mask screen: lowercase block excluded
    masked_region = clean_a + repeat.lower() + clean_b
    masked = LB.design_probes(masked_region, probe_len=40, n_probes=20,
                              gc_range=(0.0, 1.0), tm_range=(0, 200),
                              max_masked_fraction=0.2)
    for p in masked.probes:
        assert p.masked_fraction <= 0.2


# ---------------------------------------------------------------------------
# Probe reports + primer selection + assembly QC
# (reference library_tools/design.py:270-948, assemble.py:208-752,
#  quality_check.py:93-420)
# ---------------------------------------------------------------------------


def _designer_fixture(tmp_path):
    """gff3 genome with two genes (~600 bp spliced each) and one
    duplicated 120 bp chunk (an off-target the designer must avoid)."""
    rng = np.random.default_rng(7)
    genome_arr = rng.choice(list("ACGT"), 6000)
    genome = {"chr1": "".join(genome_arr)}
    gff = tmp_path / "genes.gff3"
    gff.write_text("\n".join([
        "##gff-version 3",
        "chr1\tens\tgene\t101\t800\t.\t+\t.\tID=gene:GA;Name=GA",
        "chr1\tens\tmRNA\t101\t800\t.\t+\t.\tID=transcript:TA;"
        "Parent=gene:GA",
        "chr1\tens\texon\t101\t400\t.\t+\t.\tParent=transcript:TA",
        "chr1\tens\texon\t501\t800\t.\t+\t.\tParent=transcript:TA",
        "chr1\tens\tgene\t1001\t1600\t.\t+\t.\tID=gene:GB;Name=GB",
        "chr1\tens\tmRNA\t1001\t1600\t.\t+\t.\tID=transcript:TB;"
        "Parent=gene:GB",
        "chr1\tens\texon\t1001\t1600\t.\t+\t.\tParent=transcript:TB",
        "", ]))
    # duplicate GA's first 120 transcript bases far away in the genome
    dup = genome["chr1"][100:220]
    genome["chr1"] = genome["chr1"][:4000] + dup \
        + genome["chr1"][4000 + len(dup):]
    return str(gff), genome


def test_probe_designer_end_to_end(tmp_path):
    from imageanalysis3_tpu.library.reports import (
        ProbeDesigner, MapSpec, select_primer_pair, check_library,
        parse_probe_sequence, DEFAULT_MASKS)

    gff, genome = _designer_fixture(tmp_path)
    genes = LB.read_gff3(gff)
    targets = {}
    for gname, gene in genes.items():
        tx = next(iter(gene.transcripts.values()))
        targets[gname] = LB.extract_transcript_sequence(genome, tx)
    assert len(targets) == 2 and all(len(s) >= 550
                                     for s in targets.values())

    genome_table = LB.KmerCountTable(17)
    genome_table.consume(genome["chr1"], count_rc=False)
    rep_table = LB.KmerCountTable(17)
    rep_table.consume("AT" * 40, count_rc=False)     # a fake repeat lib

    designer = ProbeDesigner(
        targets,
        maps={"genome": MapSpec(genome_table, two_stranded=True),
              "rep_genome": MapSpec(rep_table, two_stranded=True)},
        pb_len=42, word_size=17, buffer_len=2,
        check_dic={
            "gc": (0.2, 0.8),
            "tm": 55.0,
            "masks": list(DEFAULT_MASKS),
            # genome hits beyond the region's own (the duplicated chunk)
            ("genome", "self_sequences"): 10,
            "rep_genome": 0,
        })
    cands = designer.compute_reports()
    assert len(cands) > 500
    # a candidate inside the duplicated chunk sees ~26 extra genome hits
    dup_pb = next(pb for pb, i in cands.items()
                  if i["reg_name"] == "GA" and i["pb_index"] == 30)
    assert dup_pb in cands
    extra = cands[dup_pb]["map_genome"] \
        - cands[dup_pb]["map_self_sequences"]
    assert extra > 10

    kept = designer.check_probes()
    by_region = designer.kept_by_region()
    assert len(by_region["GA"]) >= 6 and len(by_region["GB"]) >= 6
    # no kept probe overlaps the duplicated chunk [0, 120) of GA
    for pb in by_region["GA"]:
        i = kept[pb]
        assert i["pb_index"] >= 120 - 42 + 1
    # kept probes are non-overlapping with buffer spacing
    for region, pbs in by_region.items():
        starts = sorted(kept[pb]["pb_index"] for pb in pbs)
        assert all(b - a >= 42 + 2 for a, b in zip(starts, starts[1:]))

    # save/load roundtrip
    p = str(tmp_path / "designer.pkl")
    designer.save(p)
    back = ProbeDesigner.load(p)
    assert back.kept_probes == designer.kept_probes

    # --- primers + assembly + QC
    rng = np.random.default_rng(11)
    prim_cands = ["".join(rng.choice(list("ACGT"), 20)) for _ in range(60)]
    readouts = {"u": ["".join(rng.choice(list("ACGT"), 20))
                      for _ in range(4)]}
    region_to_readouts = {"GA": readouts["u"][:3],
                          "GB": readouts["u"][1:4]}
    lib_seqs = list(kept) + readouts["u"]
    fwd, rev = select_primer_pair(prim_cands[:30], prim_cands[30:],
                                  lib_seqs, word=12,
                                  gc_range=(0.25, 0.75),
                                  tm_range=(40.0, 100.0))
    assert fwd != rev

    oligos, regions = [], []
    for region, pbs in by_region.items():
        for pb in pbs:
            sites = region_to_readouts[region]
            oligos.append(fwd + "".join(sites) + pb
                          + LB.reverse_complement(rev))
            regions.append(region)
    report = check_library(
        oligos, regions, fwd, rev, readouts, region_to_readouts,
        primer_len=20, readout_len=20, target_len=42, n_readouts=3,
        min_region_size=6)
    assert report["ok"], report

    parts = parse_probe_sequence(oligos[0])
    assert parts["fwd_primer"] == fwd
    assert parts["target"] in kept

    # negative: corrupt one oligo's forward primer -> primer check fails
    bad = ["X" * 20 + oligos[0][20:]] + oligos[1:]
    report_bad = check_library(
        bad, regions, fwd, rev, readouts, region_to_readouts,
        min_region_size=6)
    assert not report_bad["primer_usage"] and not report_bad["ok"]


def test_encoding_helpers_and_fasta_write(tmp_path):
    """Codebook encoding utilities (reference library_tools/encoding.py)
    and FASTA writing (LibraryTools.fastawrite)."""
    # on-bit lists -> +1/-1 matrix
    m = LB.convert_bits_to_matrix([[0, 2], [1, 3], [0, 3]])
    assert m.shape == (3, 4)
    np.testing.assert_array_equal(m[0], [1, -1, 1, -1])
    np.testing.assert_array_equal(m.sum(axis=1), [0, 0, 0])
    assert LB.convert_bits_to_matrix([]).shape == (0, 0)

    # closest-overlap distance for hyb-round ordering
    placed = [[0, 2], [1, 3], [4, 5]]
    # bit 1 appears at row 1 (>= location 1 -> distance +1) => 1
    assert LB.calculate_closest_overlap(placed, [1, 9], 1) == 1.0
    # bits absent everywhere => len+1
    assert LB.calculate_closest_overlap(placed, [8, 9], 1) == 4.0
    # empty list => inf
    assert LB.calculate_closest_overlap([], [0], 0) == float("inf")
    with pytest.raises(ValueError):
        LB.calculate_closest_overlap(placed, [0], 7)

    # fasta round-trip incl. append + wrapping
    p = str(tmp_path / "lib.fasta")
    LB.write_fasta(p, {"a": "ACGTACGT", "b": "GGCC"}, width=4)
    LB.write_fasta(p, [("c", "TTTT")], append=True)
    back = LB.read_fasta(p)
    assert back == {"a": "ACGTACGT", "b": "GGCC", "c": "TTTT"}


def test_load_position_file(tmp_path):
    """Stage positions.txt (reference meta_tools/global_alignments.py)."""
    from imageanalysis3_tpu.io import load_position_file
    p = tmp_path / "positions.txt"
    p.write_text("100.5,-20.25\n101.5,30.0\n")
    pos = load_position_file(str(p))
    np.testing.assert_allclose(pos, [[100.5, -20.25], [101.5, 30.0]])
    bad = tmp_path / "bad.txt"
    bad.write_text("1,2,3\n")
    with pytest.raises(ValueError):
        load_position_file(str(bad))
