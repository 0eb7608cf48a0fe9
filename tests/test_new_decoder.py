"""DataFrame decode facades (reference classes/new_decoder.py)."""

import numpy as np
import pandas as pd
import pytest

from imageanalysis3_tpu.io.spots import spots_to_dataframe
from imageanalysis3_tpu.decode.new_decoder import (SpotDecoder, SpotMapper,
                                                   codebook_dataframe_to_tables)

PX = np.array([200.0, 108.0, 108.0])


def _codebook_df(n_genes=6, n_bits=16, n_on=2, rng=None):
    rng = rng or np.random.default_rng(0)
    rows, used = [], set()
    while len(rows) < n_genes:
        on = tuple(sorted(rng.choice(n_bits, n_on, replace=False)))
        if on in used:
            continue
        used.add(on)
        rows.append(on)
    data = {"name": [f"chr1:{i*1000}-{i*1000+500}" for i in range(n_genes)],
            "id": np.arange(n_genes) + 50}
    for b in range(n_bits):
        data[str(b + 1)] = [int(b in on) for on in rows]
    return pd.DataFrame(data)


def test_codebook_dataframe_parsing():
    df = _codebook_df()
    cb, meta = codebook_dataframe_to_tables(df)
    assert cb.matrix.shape == (6, 16)
    assert list(cb.ids) == list(range(50, 56))
    assert list(cb.bit_values) == list(range(1, 17))
    assert "name" in meta.columns


def test_spot_decoder_dataframe_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    df_cb = _codebook_df(rng=rng)
    cb, _ = codebook_dataframe_to_tables(df_cb)
    spots, bits = [], []
    planted = []
    for t in range(10):
        g = rng.integers(0, len(cb.matrix))
        center = rng.uniform(3000, 15000, 3)
        on_bits = cb.bit_values[cb.matrix[g] > 0]
        for b in on_bits:
            row = np.zeros(11)
            row[0] = rng.uniform(800, 1500)
            row[1:4] = (center + rng.normal(0, 40, 3)) / PX
            spots.append(row)
            bits.append(int(b))
        planted.append(int(cb.ids[g]))
    cand_df = spots_to_dataframe(np.asarray(spots), bits,
                                 ["647"] * len(bits), fov_id=0, cell_id=1)
    dec = SpotDecoder(cand_df, df_cb,
                      save_file=str(tmp_path / "dec.h5"))
    gdf = dec.groups_dataframe()
    assert set(gdf["region_id"]) <= set(df_cb["id"])
    # most planted tuples decoded to the right region
    hits = sum(1 for rid in planted if rid in set(gdf["region_id"]))
    assert hits >= 8
    dec.save()
    back = SpotDecoder.load_groups(str(tmp_path / "dec.h5"))
    assert len(back) == len(gdf)


def test_spot_mapper_sequential(tmp_path):
    rng = np.random.default_rng(2)
    n_regions = 5
    data = {"name": [f"chr2:{i*100}-{i*100+50}" for i in range(n_regions)],
            "id": np.arange(n_regions) + 1}
    for b in range(8):
        data[str(b + 1)] = [int(b == i) for i in range(n_regions)]
    df_cb = pd.DataFrame(data)
    spots = rng.uniform(0, 50, (12, 11))
    bits = [1, 2, 3, 4, 5, 6, 7, 8, 1, 2, 3, 4]   # bits 6-8 unmapped
    cand_df = spots_to_dataframe(spots, bits, ["750"] * 12, fov_id=0,
                                 cell_id=0)
    mapper = SpotMapper(cand_df, df_cb,
                        save_file=str(tmp_path / "map.h5"))
    df = mapper.filtered_spots_df
    assert len(df) == 9                  # bits 6,7,8 dropped
    assert set(df["region_id"]) == {1, 2, 3, 4, 5}
    assert df.loc[df["bit"] == 2, "chr"].iloc[0] == "chr2"
    by_region = mapper.spots_by_region()
    assert len(by_region[1]) == 2 and by_region[1].shape[1] == 11
