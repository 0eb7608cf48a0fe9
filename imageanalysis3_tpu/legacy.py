"""Legacy-pipeline compatibility layer: the Cell_List / Cell_Data workflow.

Behavior target: reference classes/__init__.py:817-4513 — the first-
generation per-cell pipeline notebooks drive: load drift, crop candidate
images, identify chromosomes, multi-fit, pick spots (naive/dynamic/EM),
and generate distance maps.  This module keeps that *workflow shape* as a
thin compatibility facade over the TPU engine so reference users can port
notebooks method-by-method; new code should use pipeline.FieldOfView /
ExperimentDriver directly.

Deliberate differences: no pickled `cell_info` state (the HDF5 store is
the checkpoint), no multiprocessing pools (the device is the
parallelism), and segmentation comes from segmentation.segment_nuclei or
imported masks rather than the retired DAPI watershed.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from .analysis.distmap import distance_map, median_distance_map
from .config import DEFAULT_PIXEL_SIZE_NM, ExperimentConfig
from .decode.picking import (build_candidate_table, em_pick_spots,
                             dynamic_pick_spots, naive_pick_spots)
from .pipeline.experiment import ExperimentDriver
from .io.store import FovStore


class CellData:
    """One cell's picking workflow (reference Cell_Data,
    classes/__init__.py:2371-4443)."""

    def __init__(self, cand_spots_by_region: Dict[int, np.ndarray],
                 chrom_coords: Optional[Sequence[np.ndarray]] = None,
                 pixel_size_nm=DEFAULT_PIXEL_SIZE_NM):
        self.cand_spots = cand_spots_by_region
        self.chrom_coords = (None if chrom_coords is None
                             else [np.asarray(c) for c in chrom_coords])
        self.pixel_size = np.asarray(pixel_size_nm)
        self.picked: Dict[int, dict] = {}

    # -- picking (reference _pick_spots, :3733-4038) -----------------------

    def _pick_spots(self, method: str = "EM",
                    **kwargs) -> List[np.ndarray]:
        """Pick one trace per chromosome; methods 'naive' | 'dynamic' |
        'EM' (the reference's three pickers)."""
        import jax.numpy as jnp

        cand, valid, ids = build_candidate_table(self.cand_spots)
        centers = (self.chrom_coords if self.chrom_coords
                   else [None])
        traces = []
        for ci, center in enumerate(centers):
            ctr = (None if center is None
                   else jnp.asarray(center, jnp.float32))
            if method.upper() == "EM":
                res = em_pick_spots(jnp.asarray(cand), jnp.asarray(valid),
                                    jnp.asarray(ids), chrom_center=ctr,
                                    **kwargs)
                trace = np.asarray(res.trace)
                self.picked[ci] = {"sel_idx": np.asarray(res.sel_idx),
                                   "scores": np.asarray(res.scores)}
            elif method.lower() == "dynamic":
                # intensity-only spot scores; continuity comes from the DP
                sc = jnp.where(jnp.asarray(valid),
                               jnp.log(jnp.maximum(
                                   jnp.asarray(cand)[..., 0], 1e-6)),
                               -jnp.inf)
                sel, _ = dynamic_pick_spots(
                    jnp.asarray(cand), jnp.asarray(valid), sc,
                    jnp.asarray(ids), jnp.float32(500.0), **kwargs)
                sel = np.asarray(sel)
                trace = cand[np.arange(len(ids)), sel]
                has = valid[np.arange(len(ids)), sel]
                trace = np.where(has[:, None], trace, np.nan)
                self.picked[ci] = {"sel_idx": sel}
            else:
                tr, has = naive_pick_spots(jnp.asarray(cand),
                                           jnp.asarray(valid), ctr)
                trace = np.asarray(tr)
                self.picked[ci] = {}
            traces.append(trace)
        self.picked_traces = traces
        return traces

    # -- distance maps (reference _generate_distance_map, :4123-4273) ------

    def _generate_distance_map(self) -> List[np.ndarray]:
        import jax.numpy as jnp

        if not hasattr(self, "picked_traces"):
            self._pick_spots()
        maps = []
        for trace in self.picked_traces:
            zxys = trace[:, 1:4] * self.pixel_size[None]
            maps.append(np.asarray(distance_map(jnp.asarray(zxys))))
        self.distance_maps = maps
        return maps


class CellList:
    """Experiment-wide driver over cells/FOVs (reference Cell_List,
    classes/__init__.py:817-2370)."""

    def __init__(self, data_folder: str, save_folder: str,
                 cfg: Optional[ExperimentConfig] = None, **driver_kwargs):
        self.driver = ExperimentDriver(data_folder, save_folder, cfg=cfg,
                                       **driver_kwargs)
        self.cells: List[CellData] = []

    def _process_fovs(self, overwrite: bool = False) -> Dict[str, dict]:
        return self.driver.process_all(overwrite=overwrite)

    def _create_cells(self, data_type: str = "unique") -> List[CellData]:
        """One CellData per FOV from the stored candidate spots (cell
        segmentation gating happens upstream via analysis.partition)."""
        self.cells = []
        for fov in self.driver.fovs:
            with FovStore(self.driver.store_path(fov), "r") as store:
                if data_type not in store.data_types():
                    continue
                spots = store.load_all_spots(data_type)
            self.cells.append(CellData(spots))
        return self.cells

    def _calculate_population_map(self) -> np.ndarray:
        """Median distance map across all cells (reference
        Cell_List._calculate_population_map, :1628-1805)."""
        import jax.numpy as jnp

        maps = []
        for cell in self.cells:
            if not hasattr(cell, "picked_traces"):
                cell._pick_spots()
            trace = cell.picked_traces[0]
            maps.append(trace[:, 1:4] * cell.pixel_size[None])
        zxys = np.stack(maps)
        return np.asarray(median_distance_map(jnp.asarray(zxys)))
