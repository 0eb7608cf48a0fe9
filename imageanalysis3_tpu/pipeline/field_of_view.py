"""Field_of_View facade: the reference's per-FOV god-object, slimmed.

Behavior target: reference classes/field_of_view.py:44-2621
(Field_of_View): one object owning a FOV's folders, save file, drift,
spot tables and downstream picking.  Here it composes the already-tested
engine pieces — ExperimentDriver (scan/correct/drift/fit/persist with
resume), the candidate-table builder, the EM picker and the distance
map — into the reference's workflow methods:

    fov = FieldOfView(data_folder, save_folder, fov_name)
    fov.process_image_to_spots("unique")      # :901-1158
    cands = fov.load_candidate_spots("unique")
    res = fov.pick_spots(method="EM")         # legacy _pick_spots :3733
    dm = fov.distance_map(res.trace)          # _generate_distance_map :4123
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from ..config import ExperimentConfig, DEFAULT_PIXEL_SIZE_NM
from ..analysis.distmap import distance_map
from ..decode.picking import (build_candidate_table, em_pick_spots,
                              naive_pick_spots, EMPickResult)
from ..io.store import FovStore
from .experiment import ExperimentDriver


class FieldOfView:
    """Per-FOV workflow facade over the TPU engine."""

    def __init__(self, data_folder: str, save_folder: str, fov_name: str,
                 cfg: Optional[ExperimentConfig] = None, **driver_kwargs):
        self.fov_name = fov_name
        self.driver = ExperimentDriver(data_folder, save_folder, cfg=cfg,
                                       **driver_kwargs)
        if fov_name not in self.driver.fovs:
            raise FileNotFoundError(
                f"{fov_name} not among {self.driver.fovs}")

    # -- acquisition -> spots ---------------------------------------------

    def process_image_to_spots(self, overwrite: bool = False
                               ) -> Dict[str, int]:
        """Correct + register + fit every pending round (reference
        _process_image_to_spots, classes/field_of_view.py:901-1158)."""
        return self.driver.process_fov(self.fov_name, overwrite=overwrite)

    @property
    def store_path(self) -> str:
        return self.driver.store_path(self.fov_name)

    def load_candidate_spots(self, data_type: str = "unique"
                             ) -> Dict[int, np.ndarray]:
        """region id -> (n, 11) corrected spots from the save file."""
        with FovStore(self.store_path, "r") as store:
            return store.load_all_spots(data_type)

    def drifts(self, data_type: str = "unique"
               ) -> Tuple[np.ndarray, np.ndarray]:
        with FovStore(self.store_path, "r") as store:
            g = store._fh[data_type]
            return g["drifts"][:], store.drift_flags(data_type)

    # -- picking -----------------------------------------------------------

    def candidate_table(self, data_type: str = "unique",
                        capacity: Optional[int] = None):
        spots = self.load_candidate_spots(data_type)
        return build_candidate_table(spots, capacity=capacity)

    def pick_spots(self, data_type: str = "unique", method: str = "EM",
                   chrom_center: Optional[np.ndarray] = None,
                   **pick_kwargs) -> EMPickResult:
        """Candidate spots -> one chromosome trace (reference
        Cell_Data._pick_spots, classes/__init__.py:3733-4038; methods
        'EM' and 'naive')."""
        import jax.numpy as jnp

        cand, valid, ids = self.candidate_table(data_type)
        if method.upper() == "EM":
            return em_pick_spots(
                jnp.asarray(cand), jnp.asarray(valid), jnp.asarray(ids),
                chrom_center=None if chrom_center is None
                else jnp.asarray(chrom_center, jnp.float32), **pick_kwargs)
        trace, has = naive_pick_spots(
            jnp.asarray(cand), jnp.asarray(valid),
            None if chrom_center is None
            else jnp.asarray(chrom_center, jnp.float32))
        sel = jnp.argmax(jnp.where(jnp.asarray(valid),
                                   jnp.asarray(cand)[..., 0], -jnp.inf),
                         axis=1)
        return EMPickResult(trace=trace, sel_idx=sel, sel_valid=has,
                            scores=jnp.where(has, 0.0, jnp.nan),
                            n_iters=jnp.int32(0),
                            change_ratio=jnp.float32(0.0))

    # -- analysis -----------------------------------------------------------

    def distance_map(self, trace: np.ndarray,
                     pixel_size_nm=DEFAULT_PIXEL_SIZE_NM) -> np.ndarray:
        """Picked trace -> (R, R) nm distance map (reference
        _generate_distance_map, classes/__init__.py:4123-4273)."""
        import jax.numpy as jnp

        trace = np.asarray(trace)
        zxys = trace[:, 1:4] * np.asarray(pixel_size_nm)[None]
        return np.asarray(distance_map(jnp.asarray(zxys)))
