"""DNA MERFISH front door: spots -> per-chromosome homolog traces
(reference DNA_Merfish_Decoder / batch_decode_BB_like,
classes/decode.py:694-2199)."""

import numpy as np
import pandas as pd
import pytest

from imageanalysis3_tpu.decode.dna_decoder import DNAMerfishDecoder, batch_decode

PX = np.array([200.0, 108.0, 108.0])


def _codebook_two_chr(rng, n_per_chr=8, n_bits=32, n_on=3):
    rows, used = [], set()
    while len(rows) < 2 * n_per_chr:
        on = tuple(sorted(rng.choice(n_bits, n_on, replace=False)))
        pairs = {(a, b) for ai, a in enumerate(on) for b in on[ai + 1:]}
        if pairs & used:
            continue
        used |= pairs
        rows.append(on)
    data = {"id": np.arange(len(rows)) + 100,
            "name": [f"reg{i}" for i in range(len(rows))],
            "chr": ["chr1"] * n_per_chr + ["chr2"] * n_per_chr}
    for b in range(n_bits):
        data[str(b + 1)] = [int(b in on) for on in rows]
    return pd.DataFrame(data)


@pytest.fixture(scope="module")
def cell():
    rng = np.random.default_rng(21)
    df = _codebook_two_chr(rng)
    n_per_chr = 8
    # two homolog territories per chromosome; chr1 and chr2 territories
    # are well separated
    territory = {("chr1", 0): np.array([2000.0, 3000, 3000]),
                 ("chr1", 1): np.array([2000.0, 3000, 12000]),
                 ("chr2", 0): np.array([2000.0, 12000, 3000]),
                 ("chr2", 1): np.array([2000.0, 12000, 12000])}
    spots, bits = [], []
    truth = {}
    gi = 0
    for chr_name in ("chr1", "chr2"):
        for r in range(n_per_chr):
            row = df.iloc[gi]
            on_bits = [int(c) for c in df.columns
                       if c not in ("id", "name", "chr") and row[c] > 0]
            for h in range(2):
                center = (territory[(chr_name, h)]
                          + np.cumsum(np.ones(3)) * 0 + r * 150.0
                          + np.random.default_rng(gi * 2 + h).normal(0, 80, 3))
                truth[(chr_name, h, int(row["id"]))] = center
                for b in on_bits:
                    s = np.zeros(11)
                    s[0] = rng.uniform(800, 1500)
                    s[1:4] = (center + rng.normal(0, 40, 3)) / PX
                    spots.append(s)
                    bits.append(b)
            gi += 1
    return df, np.asarray(spots, np.float32), np.asarray(bits), truth


def test_dna_decoder_two_chromosomes(cell):
    df, spots, bits, truth = cell
    dec = DNAMerfishDecoder(df, keep_ratio_th=0.2)
    out = dec.decode(spots, bits)
    assert out is not None
    assert set(out) == {"chr1", "chr2"}
    for chr_name, res in out.items():
        zxys = np.asarray(res.zxys)
        okz = np.asarray(res.zxys_valid)
        assert zxys.shape[0] == 2
        # most regions assigned on each homolog
        assert okz.mean() >= 0.6, (chr_name, okz.mean())
    z_all, labels = dec.summarize_zxys_all_chromosomes()
    assert len(z_all) == len(labels)
    assert any(l.startswith("chr1_") for l in labels)


def test_dna_decoder_keep_ratio_gate(cell):
    df, spots, bits, truth = cell
    dec = DNAMerfishDecoder(df, keep_ratio_th=0.5)
    assert dec.decode(spots[:5], bits[:5]) is None


def test_batch_decode(cell):
    df, spots, bits, truth = cell
    out = batch_decode({"cell0": {"spots": spots, "bits": bits}}, df,
                       keep_ratio_th=0.2)
    assert "cell0" in out and out["cell0"] is not None
