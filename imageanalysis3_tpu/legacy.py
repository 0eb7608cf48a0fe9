"""Legacy-pipeline compatibility layer: the Cell_List / Cell_Data workflow.

Behavior target: reference classes/__init__.py:817-4513 — the first-
generation per-cell pipeline notebooks drive: load drift, crop candidate
images (`_crop_images`), identify chromosomes, multi-fit, pick spots
(naive/dynamic/EM), generate distance maps, merge RNA results into DNA
cells (`_merge_RNA_to_DNA`), and reduce population maps
(median/mean/contact, `_calculate_population_map`).  This module keeps
that *workflow shape* as a compatibility facade over the TPU engine so
reference users can port notebooks method-by-method; new code should use
pipeline.FieldOfView / ExperimentDriver directly.

Deliberate differences: no pickled `cell_info` state (the HDF5 store is
the checkpoint), no multiprocessing pools (the device is the
parallelism), and segmentation comes from segmentation.segment_nuclei or
imported masks rather than the retired DAPI watershed.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from .analysis.distmap import distance_map
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

    # -- per-cell image crops (reference _crop_images, :2780-2962) ---------

    @staticmethod
    def _crop_images(store: "FovStore", data_type: str,
                     segmentation_labels: np.ndarray, cell_id: int,
                     extend_dim: int = 20) -> Dict[int, np.ndarray]:
        """Crop every stored region image to this cell's xy bounding box
        (full z), extended by `extend_dim` pixels.

        Behavior target: Cell_Data._crop_images
        (classes/__init__.py:2780-2962), which slices each round's image
        to the cell's segmentation box.  Difference by design: the
        reference crops raw rounds and drift-translates each crop; here
        the store's images are already fully corrected (drift included,
        pipeline/fov.py), so the crop is a plain box slice.  Requires the
        driver to have run with save_images=True.
        """
        mask = np.asarray(segmentation_labels) == int(cell_id)
        if not mask.any():
            raise ValueError(f"cell {cell_id} absent from segmentation")
        xy = mask.any(axis=0)
        xs, ys = np.where(xy)
        x0 = max(int(xs.min()) - extend_dim, 0)
        x1 = int(xs.max()) + 1 + extend_dim
        y0 = max(int(ys.min()) - extend_dim, 0)
        y1 = int(ys.max()) + 1 + extend_dim
        out: Dict[int, np.ndarray] = {}
        g = store._fh[data_type]
        for i, rid in enumerate(g["ids"][:]):
            if "ims" in g:
                out[int(rid)] = g["ims"][i][:, x0:x1, y0:y1]
        if not out:
            raise KeyError(f"no images stored for {data_type}; run the "
                           f"driver with save_images=True")
        return out

    @staticmethod
    def _crop_images_from_disk(driver, fov_name: str, data_type: str,
                               segmentation_labels: np.ndarray,
                               cell_id: int, extend_dim: int = 20,
                               region_ids=None) -> Dict[int, np.ndarray]:
        """Disk variant of :meth:`_crop_images` for runs without stored
        corrected images: window-read each region's raw movie around this
        cell's bounding box and drift-correct the crop
        (ExperimentDriver.load_region_crops; reference Cell_Data
        _crop_images raw path, classes/__init__.py:2780-2962)."""
        mask = np.asarray(segmentation_labels) == int(cell_id)
        if not mask.any():
            raise ValueError(f"cell {cell_id} absent from segmentation")
        xy = mask.any(axis=0)
        xs, ys = np.where(xy)
        lims = [[max(int(xs.min()) - extend_dim, 0),
                 int(xs.max()) + 1 + extend_dim],
                [max(int(ys.min()) - extend_dim, 0),
                 int(ys.max()) + 1 + extend_dim]]
        return driver.load_region_crops(fov_name, lims, data_type,
                                        region_ids=region_ids)

    # -- RNA -> DNA merge (reference _merge_RNA_to_DNA, :4274-4327) --------

    def _merge_RNA_to_DNA(self, source: "CellData",
                          attr_feature: str = "rna-",
                          overwrite: bool = False) -> List[str]:
        """Append the RNA cell's public data attributes onto this (DNA)
        cell under `attr_feature`-prefixed names.

        Behavior target: Cell_Data._merge_RNA_to_DNA 'cell_info' mode
        (classes/__init__.py:4274-4327): every public attribute of the
        source is copied as `rna-<attr>` (already-prefixed names kept)
        unless present and not overwriting.  Returns the names added.
        """
        added: List[str] = []
        for attr in dir(source):
            if attr.startswith("_") or callable(getattr(source, attr)):
                continue
            new_attr = attr if attr_feature in attr \
                else attr_feature + attr
            if hasattr(self, new_attr.replace("-", "_")) and not overwrite:
                continue
            # python identifiers can't carry '-', the reference stores
            # these in a dict; attributes here use '_'
            setattr(self, new_attr.replace("-", "_"),
                    getattr(source, attr))
            added.append(new_attr)
        return added


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

    def _calculate_population_map(self, stat_type: str = "median",
                                  contact_th: float = 200.0,
                                  max_loss_prob: float = 0.2,
                                  return_all_maps: bool = False):
        """Population map across all cells (reference
        Cell_List._calculate_population_map, classes/__init__.py:
        1628-1805): collect per-cell distance maps, drop chromosomes
        whose all-NaN-row fraction exceeds `max_loss_prob` or whose
        shape disagrees with the majority, then reduce.

        stat_type: 'median' | 'mean' (nan-aware) | 'contact'
        (fraction of cells with distance < `contact_th` nm, the
        reference's `< _contact_th` over `< + >` normalization).
        Returns (map, n_chromosomes_used) — or
        (map, n, all_maps) with return_all_maps.
        """
        if stat_type not in ("median", "mean", "contact"):
            raise ValueError(f"stat_type {stat_type!r} not in "
                             f"median/mean/contact")
        cand: List[np.ndarray] = []
        for cell in self.cells:
            if not hasattr(cell, "distance_maps"):
                cell._generate_distance_map()
            for dmap in cell.distance_maps:
                n = len(dmap)
                failure = np.sum(np.isnan(dmap).sum(0) >= n - 1) / n
                if failure > max_loss_prob:
                    continue
                cand.append(np.asarray(dmap, np.float64))
        if not cand:
            raise ValueError("no distance maps survive the loss screen")
        sizes = [m.shape[0] for m in cand]
        keep_n = max(set(sizes), key=sizes.count)
        cand = [m for m in cand if m.shape[0] == keep_n]
        total = np.stack(cand)
        with np.errstate(all="ignore"):
            if stat_type == "median":
                out = np.nanmedian(total, axis=0)
            elif stat_type == "mean":
                out = np.nanmean(total, axis=0)
            else:
                close = np.nansum(total < contact_th, axis=0)
                far = np.nansum(total > contact_th, axis=0)
                out = close / np.maximum(close + far, 1)
        if return_all_maps:
            return out, len(cand), total
        return out, len(cand)
