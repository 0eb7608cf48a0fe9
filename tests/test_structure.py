"""Structure + population analysis (reference domain_tools/interaction.py,
structure_tools/, postanalysis.py, celltype_tools/)."""

import numpy as np
import pytest

from imageanalysis3_tpu.analysis import structure as ST
from imageanalysis3_tpu.analysis import population as POP


def _two_block_trace(rng, sizes=(12, 12), sep=3000.0):
    pts, origin = [], np.zeros(3)
    for s in sizes:
        blk = origin + np.cumsum(rng.normal(0, 50, (s, 3)), axis=0)
        pts.append(blk)
        origin = blk[-1] + np.array([sep, 0, 0])
    return np.concatenate(pts)


def test_contact_and_domain_contact_freq():
    rng = np.random.default_rng(0)
    zxys = _two_block_trace(rng)
    dm = np.linalg.norm(zxys[:, None] - zxys[None], axis=-1)
    freq = ST.domain_contact_freq(dm, [0, 12], contact_th=500.0)
    assert freq[0, 0] > 0.8 and freq[1, 1] > 0.8
    assert freq[0, 1] < 0.1


def test_inter_domain_interactions():
    rng = np.random.default_rng(1)
    # three domains: 0 and 2 co-mingle in space, 1 is far away
    blk0 = rng.normal([0, 0, 0], 120, (10, 3))
    blk1 = rng.normal([5000, 0, 0], 120, (10, 3))
    blk2 = rng.normal([0, 0, 0], 120, (10, 3))
    zxys = np.concatenate([blk0, blk1, blk2])
    dm = np.linalg.norm(zxys[:, None] - zxys[None], axis=-1)
    pairs = ST.inter_domain_interactions(dm, [0, 10, 20],
                                         separation_th=0.55)
    assert (0, 2) in pairs
    assert (0, 1) not in pairs


def test_loop_out_detection():
    rng = np.random.default_rng(2)
    zxys = _two_block_trace(rng)
    # region 5 loops out of domain 0 into domain 1's territory
    zxys[5] = zxys[18] + rng.normal(0, 20, 3)
    dm = np.linalg.norm(zxys[:, None] - zxys[None], axis=-1)
    loops = ST.call_loop_outs(dm, [0, 12], loop_out_th=0.5, window=3)
    assert any(pos in (4, 5, 6) and dom == 1 for pos, dom in loops)


def test_genome_distance_summary():
    rng = np.random.default_rng(3)
    chr_2 = {
        "chr1": rng.normal([0, 0, 0], 100, (5, 8, 3)),
        "chr2": rng.normal([5000, 0, 0], 100, (5, 6, 3)),
    }
    intra, inter = ST.genome_distance_summary(chr_2)
    assert intra["chr1"].shape == (8, 8)
    assert 4000 < inter[("chr1", "chr2")] < 6000


def test_bed_overlap(tmp_path):
    bed = tmp_path / "marks.bed"
    bed.write_text("chr1\t100\t200\nchr1\t150\t400\nchr2\t0\t50\n")
    intervals = POP.load_bed(str(bed))
    regions = {1: {"chr": "chr1", "start": 100.0, "end": 300.0},
               2: {"chr": "chr2", "start": 100.0, "end": 200.0},
               3: {"chr": "chr3", "start": 0.0, "end": 100.0}}
    fr = POP.region_overlap_fraction(regions, intervals)
    assert fr[1] > 0.9            # overlapping marks cover most of it
    assert fr[2] == 0.0 and fr[3] == 0.0


def test_assign_compartments_from_domains():
    rng = np.random.default_rng(4)
    # four domains, alternating between two spatial territories
    blocks = []
    for k in range(4):
        center = np.array([0.0, 0, 0]) if k % 2 == 0 else \
            np.array([4000.0, 0, 0])
        blocks.append(center + rng.normal(0, 120, (8, 3)))
    zxys = np.concatenate(blocks)
    starts = [0, 8, 16, 24]
    marker = {r: (1.0 if (r // 8) % 2 == 0 else 0.0) for r in range(32)}
    dom_labels, reg_labels = POP.assign_compartments_from_domains(
        zxys, starts, a_marker_fraction=marker)
    assert dom_labels[0] == dom_labels[2] == 0      # marker-rich = A
    assert dom_labels[1] == dom_labels[3] == 1


def test_cell_type_classifier():
    rng = np.random.default_rng(5)
    n = 120
    # two types with distinct marker genes
    counts = rng.poisson(2, (n, 10)).astype(float)
    labels = np.array(["A"] * (n // 2) + ["B"] * (n // 2))
    counts[:n // 2, 0] += rng.poisson(30, n // 2)
    counts[n // 2:, 1] += rng.poisson(30, n // 2)
    clf = POP.CellTypeClassifier(hidden=(16,), max_iter=300)
    clf.fit(counts[::2], labels[::2])
    acc = clf.score(counts[1::2], labels[1::2])
    assert acc >= 0.9
