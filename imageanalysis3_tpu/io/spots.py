"""Spot-table interchange: arrays <-> pandas DataFrame <-> HDF5.

Behavior targets (reference io_tools/spots.py:1-375):
  * column schema                Spot3D_infos = [height, z, x, y,
    background, sigma_z, sigma_x, sigma_y, sin_t, sin_p, eps] plus
    fov_id / cell_id / bit / channel / uid / pixel_{z,x,y}
  * cell spots -> DataFrame      FovCell2Spots_2_DataFrame (:27-85)
  * DataFrame -> cand spots      CellSpotsDf_2_CandSpots (:16-25)
  * decoded tuples <-> DataFrame SpotTuple_2_Dict / Dataframe_2_SpotGroups
    (:88-375), here in long format (one row per tuple member with a
    group_id key)

The reference persists via pandas.to_hdf (pytables + blosc); this image has
no pytables, so HDF5 persistence writes plain h5py datasets per column —
same content, dependency-free.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import h5py
import numpy as np
import pandas as pd

from ..config import DEFAULT_PIXEL_SIZE_NM

#: the 11 natural spot parameters (reference Spot3D_infos)
SPOT3D_COLUMNS = ["height", "z", "x", "y", "background", "sigma_z",
                  "sigma_x", "sigma_y", "sin_t", "sin_p", "eps"]
PIXEL_COLUMNS = ["pixel_z", "pixel_x", "pixel_y"]


def spots_to_dataframe(spots: np.ndarray,
                       bits: Optional[Sequence] = None,
                       channels: Optional[Sequence] = None,
                       valid: Optional[np.ndarray] = None,
                       fov_id: Optional[int] = None,
                       cell_id: Optional[int] = None,
                       uid: Optional[str] = None,
                       pixel_sizes=DEFAULT_PIXEL_SIZE_NM) -> pd.DataFrame:
    """(N, 11) spot rows -> the reference's cand-spots DataFrame schema."""
    spots = np.atleast_2d(np.asarray(spots, np.float64))
    n = len(spots)
    if valid is not None:
        keep = np.asarray(valid, bool)
        spots = spots[keep]
        bits = None if bits is None else np.asarray(bits)[keep]
        channels = None if channels is None else np.asarray(channels)[keep]
        n = len(spots)
    df = pd.DataFrame(spots, columns=SPOT3D_COLUMNS)
    df.insert(0, "fov_id", fov_id)
    df.insert(1, "cell_id", cell_id)
    df["bit"] = np.asarray(bits) if bits is not None else -1
    df["channel"] = (np.asarray(channels).astype(str)
                     if channels is not None else "")
    df["uid"] = uid
    for c, v in zip(PIXEL_COLUMNS, pixel_sizes):
        df[c] = float(v)
    return df


def dataframe_to_cand_spots(df: pd.DataFrame
                            ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                       np.ndarray]:
    """DataFrame -> ((N, 11) spots, bits, channels, pixel_sizes)
    (reference CellSpotsDf_2_CandSpots, io_tools/spots.py:16-25)."""
    spots = df[SPOT3D_COLUMNS].to_numpy(np.float32)
    bits = df["bit"].to_numpy() if "bit" in df else np.full(len(df), -1)
    channels = (df["channel"].to_numpy().astype(str)
                if "channel" in df else np.full(len(df), ""))
    if set(PIXEL_COLUMNS) <= set(df.columns) and len(df):
        px = df[PIXEL_COLUMNS].iloc[0].to_numpy(np.float32)
    else:
        px = np.asarray(DEFAULT_PIXEL_SIZE_NM, np.float32)
    return spots, bits, channels, px


def spot_groups_to_dataframe(groups, spots: np.ndarray,
                             bits: Optional[np.ndarray] = None,
                             fov_id: Optional[int] = None,
                             cell_id: Optional[int] = None,
                             homolog_flags: Optional[np.ndarray] = None,
                             pixel_sizes=DEFAULT_PIXEL_SIZE_NM
                             ) -> pd.DataFrame:
    """Decoded SpotGroups -> long DataFrame, one row per tuple member.

    Columns: group_id, region_id, homolog, member index within the tuple,
    the 11 spot parameters, bit, spot_index (into the cand-spot table).
    Equivalent content to the reference's SpotTuple dicts
    (io_tools/spots.py:88-200) in a columnar layout.
    """
    ok = np.asarray(groups.ok)
    idx = np.asarray(groups.spot_idx)
    region = np.asarray(groups.region)
    rows = []
    for gi in np.where(ok)[0]:
        members = idx[gi][idx[gi] >= 0]
        for mi, si in enumerate(members):
            row = {"fov_id": fov_id, "cell_id": cell_id,
                   "group_id": int(gi), "region_id": int(region[gi]),
                   "homolog": (int(homolog_flags[gi])
                               if homolog_flags is not None else -1),
                   "member": mi, "spot_index": int(si)}
            for c, v in zip(SPOT3D_COLUMNS, spots[si]):
                row[c] = float(v)
            row["bit"] = int(bits[si]) if bits is not None else -1
            rows.append(row)
    df = pd.DataFrame(rows)
    for c, v in zip(PIXEL_COLUMNS, pixel_sizes):
        df[c] = float(v)
    return df


def dataframe_to_spot_groups(df: pd.DataFrame,
                             capacity: Optional[int] = None):
    """Long-format group DataFrame -> decode.merfish.SpotGroups (+ the
    member spot rows), inverse of :func:`spot_groups_to_dataframe`
    (reference Dataframe_2_SpotGroups, io_tools/spots.py:300-375)."""
    import jax.numpy as jnp

    from ..decode.merfish import SpotGroups

    gids = np.sort(df["group_id"].unique())
    max_members = (int(df.groupby("group_id").size().max())
                   if len(df) else 1)
    t = capacity or max_members
    p = len(gids)
    spot_idx = np.full((p, t), -1, np.int32)
    region = np.full(p, -1, np.int32)
    n_spots = np.zeros(p, np.int32)
    for k, gid in enumerate(gids):
        sub = df[df["group_id"] == gid].sort_values("member")
        region[k] = sub["region_id"].iloc[0]
        mem = sub["spot_index"].to_numpy(np.int32)[:t]
        spot_idx[k, :len(mem)] = mem
        n_spots[k] = len(mem)
    n_total = int(df["spot_index"].max()) + 1 if len(df) else 0
    return SpotGroups(spot_idx=jnp.asarray(spot_idx),
                      region=jnp.asarray(region),
                      n_spots=jnp.asarray(n_spots),
                      ok=jnp.ones(p, bool),
                      spot_usage=jnp.zeros(n_total, jnp.int32))


def save_dataframe_hdf5(df: pd.DataFrame, path: str, key: str,
                        mode: str = "a") -> None:
    """Columnar HDF5 persistence (pandas.to_hdf stand-in: one dataset per
    column under `key`, strings as utf-8 bytes)."""
    with h5py.File(path, mode) as fh:
        if key in fh:
            del fh[key]
        g = fh.create_group(key)
        g.attrs["columns"] = list(df.columns)
        for c in df.columns:
            v = df[c].to_numpy()
            if v.dtype == object or v.dtype.kind in "US":
                v = np.array(["" if x is None else str(x) for x in v],
                             dtype="S64")
            g.create_dataset(str(c), data=v)


def load_dataframe_hdf5(path: str, key: str) -> pd.DataFrame:
    with h5py.File(path, "r") as fh:
        g = fh[key]
        cols = list(g.attrs["columns"])
        data = {}
        for c in cols:
            v = g[str(c)][:]
            if v.dtype.kind == "S":
                v = v.astype(str)
            data[c] = v
    return pd.DataFrame(data)


def spaligner_to_chr_homologs(cell_data_df: pd.DataFrame,
                              codebook_df: pd.DataFrame,
                              info_names=("fov_id", "cell_id", "uid"),
                              fill_blank: bool = True):
    """Convert an spAligner-style per-cell DataFrame into chr -> list of
    homolog traces (reference spAligner_2_chr2homologList,
    io_tools/aligner.py:3-39).

    `cell_data_df` carries one row per fitted locus with columns
    ``chr`` (may be 'chr1' or '1'), ``fiberidx`` (homolog index), ``hyb``
    (within-chromosome region order) and ``z_um/x_um/y_um``.  With
    ``fill_blank``, each homolog becomes a dense (R_chr, 3) trace with
    NaN rows for unobserved regions, sized from the codebook.
    Returns (chr_2_homolog_list, info_dict) where info_dict collects the
    unique value of each requested metadata column.
    """
    chr_2_homologs = {}
    cb_chr = codebook_df["chr"].astype(str)
    for chr_name in np.unique(cell_data_df["chr"].astype(str)):
        chrom = chr_name.split("chr")[1] if "chr" in chr_name else chr_name
        n_regions = int(np.sum(cb_chr == chrom))
        sub = cell_data_df[cell_data_df["chr"].astype(str) == chr_name]
        homologs = []
        for fbr in np.unique(sub["fiberidx"]):
            fiber = sub[sub["fiberidx"] == fbr].sort_values("hyb")
            inds = fiber["hyb"].to_numpy(int)
            coords = fiber[["z_um", "x_um", "y_um"]].to_numpy(float)
            if fill_blank:
                full = np.full((n_regions, 3), np.nan)
                full[inds] = coords
                homologs.append(full)
            else:
                homologs.append(coords)
        chr_2_homologs[chrom] = homologs
    info = {}
    for name in info_names:
        if name in cell_data_df.columns:
            info[name] = np.unique(cell_data_df[name])[0]
    return chr_2_homologs, info
