"""Cell metadata tables: mask -> per-cell locations, frame translation,
multi-FOV merging.

Behavior targets (reference meta_tools/cell_locations.py:13-245):
  * SegmentationMask3D_2_CellLocations: per-cell center of mass (um,
    relative to the FOV center), volume and bounding box from a label
    volume
  * Translate_CellLocations: shift into the microscope/stage frame
  * Merge_CellLocations: concatenate FOV tables, dropping duplicate cells
    that fall inside a neighboring FOV's table (distance-based dedupe)
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from ..config import DEFAULT_PIXEL_SIZE_NM

_AXES = ("z", "x", "y")


def segmentation_to_cell_locations(labels: np.ndarray, fov_id: int = 0,
                                   pixel_sizes=DEFAULT_PIXEL_SIZE_NM
                                   ) -> pd.DataFrame:
    """Label volume -> per-cell location table (um, FOV-center origin).

    Columns mirror the reference: fov_id, cell_id, volume, center_{z,x,y},
    min_/max_{z,x,y} (bounding box).
    """
    labels = np.asarray(labels)
    sizes = np.asarray(labels.shape, float)
    px_um = np.asarray(pixel_sizes, float) / 1000.0
    rows = []
    for cell in np.unique(labels):
        if cell <= 0:
            continue
        zz, xx, yy = np.where(labels == cell)
        coords = np.stack([zz, xx, yy], axis=1).astype(float)
        center = (coords.mean(0) - sizes / 2) * px_um
        lo = (coords.min(0) - sizes / 2) * px_um
        hi = (coords.max(0) + 1 - sizes / 2) * px_um
        row = {"fov_id": int(fov_id), "cell_id": int(cell),
               "volume": int(len(coords))}
        row.update({f"center_{a}": c for a, c in zip(_AXES, center)})
        row.update({f"min_{a}": v for a, v in zip(_AXES, lo)})
        row.update({f"max_{a}": v for a, v in zip(_AXES, hi)})
        rows.append(row)
    return pd.DataFrame(rows)


def load_position_file(path: str) -> pd.DataFrame:
    """Stage position table from a 'position.txt' file (comma-separated
    x,y per FOV row, no header — reference
    meta_tools/global_alignments.py:4-9 Load_PositionFile)."""
    pos = pd.read_csv(path, header=None)
    pos.columns = ["x", "y"]
    return pos


def translate_cell_locations(df: pd.DataFrame,
                             fov_position_um: Sequence[float]
                             ) -> pd.DataFrame:
    """Shift a FOV's table into the global stage frame (reference
    Translate_CellLocations): fov_position_um is the FOV center's stage
    coordinate (z, x, y) in um."""
    out = df.copy()
    pos = np.asarray(fov_position_um, float)
    for i, a in enumerate(_AXES):
        for col in (f"center_{a}", f"min_{a}", f"max_{a}"):
            if col in out:
                out[col] = out[col] + pos[i]
    return out


def merge_cell_locations(tables: List[pd.DataFrame],
                         duplicate_distance_um: float = 5.0
                         ) -> pd.DataFrame:
    """Concatenate stage-frame tables, dropping later-FOV cells whose
    centers duplicate an earlier cell within `duplicate_distance_um`
    (reference Merge_CellLocations overlap dedupe)."""
    kept: List[pd.DataFrame] = []
    centers: List[np.ndarray] = []
    for df in tables:
        if not len(df):
            continue
        c = df[[f"center_{a}" for a in _AXES]].to_numpy(float)
        if centers:
            prev = np.concatenate(centers)
            d = np.linalg.norm(c[:, None] - prev[None], axis=-1)
            keep = d.min(axis=1) > duplicate_distance_um
        else:
            keep = np.ones(len(df), bool)
        kept.append(df.loc[keep])
        centers.append(c[keep])
    if not kept:
        return pd.DataFrame()
    return pd.concat(kept, ignore_index=True)
