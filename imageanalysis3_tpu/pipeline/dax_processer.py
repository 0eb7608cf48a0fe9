"""Stateful per-.dax processing facade with a correction ledger.

Behavior target: reference classes/preprocess.py:337-1256 (DaxProcesser):
a per-movie object exposing stepwise corrections — `_load_image`,
`_corr_bleedthrough`, `_corr_hot_pixels_3D`, `_corr_illumination`,
`_calculate_drift`, `_warp_image`, `_gaussian_highpass`, `_fit_spots` —
with a per-channel `correction_log` ledger so re-running a step is a
no-op (:387, :482-487, :557-566), plus the static helpers
`_FindDaxChannels` / `_FindImageSize` / `_LoadInfFile`.

The facade keeps the reference's step granularity (useful for notebooks
and QC) while each step is one jitted device program; users wanting the
fused path use FovPipeline/ExperimentDriver instead.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import ALLOWED_COLORS, DEFAULT_IMAGE_SIZE
from ..io.dax import read_dax, read_inf, split_channels
from ..ops.corrections import (bleedthrough_unmix, illumination_correct,
                               remove_hot_pixels, z_shift_correct)
from ..ops.drift import align_image
from ..ops.filters import gaussian_highpass
from ..ops.gaussian_fit import FitResult, fit_fov_image
from ..ops.warp import warp_image, warp_spot_coords


class DaxProcesser:
    """Stepwise corrections on one .dax movie (reference DaxProcesser)."""

    def __init__(self, filename: str,
                 correction_channels: Optional[Sequence[str]] = None,
                 all_channels: Optional[Sequence[str]] = None,
                 single_im_size: Optional[Sequence[int]] = None,
                 num_buffer_frames: int = 10,
                 num_empty_frames: int = 0,
                 verbose: bool = False):
        self.filename = filename
        self.verbose = verbose
        self.num_buffer_frames = num_buffer_frames
        self.num_empty_frames = num_empty_frames
        self.all_channels = list(all_channels) if all_channels else \
            self._FindDaxChannels(filename, single_im_size,
                                  num_buffer_frames, num_empty_frames)
        self.channels = (list(correction_channels)
                         if correction_channels else list(self.all_channels))
        self.single_im_size = (tuple(single_im_size) if single_im_size
                               else self._FindImageSize(
                                   filename, len(self.all_channels),
                                   num_buffer_frames, num_empty_frames))
        self.ims: Dict[str, np.ndarray] = {}
        #: per-channel step ledger (reference correction_log semantics)
        self.correction_log: Dict[str, Dict[str, bool]] = {
            ch: {} for ch in self.channels}
        self.drift: Optional[np.ndarray] = None
        self.drift_flag: Optional[int] = None

    # -- static metadata helpers (reference :1150-1256) -------------------

    @staticmethod
    def _LoadInfFile(filename: str):
        return read_inf(filename)

    @staticmethod
    def _FindImageSize(filename: str, n_channels: int,
                       num_buffer_frames: int = 10,
                       num_empty_frames: int = 0) -> Tuple[int, int, int]:
        meta = read_inf(filename)
        usable = (meta.number_frames - 2 * num_buffer_frames
                  - num_empty_frames)
        return (usable // max(n_channels, 1), *meta.frame_shape)

    @staticmethod
    def _FindDaxChannels(filename: str,
                         single_im_size=None,
                         num_buffer_frames: int = 10,
                         num_empty_frames: int = 0) -> List[str]:
        """Infer the channel list from frame accounting: the usable frame
        count must decompose into n_channels stacks of equal depth."""
        meta = read_inf(filename)
        usable = (meta.number_frames - 2 * num_buffer_frames
                  - num_empty_frames)
        if single_im_size is not None:
            n = usable // int(single_im_size[0])
            return list(ALLOWED_COLORS[:n])
        for n in range(len(ALLOWED_COLORS), 0, -1):
            if usable % n == 0:
                return list(ALLOWED_COLORS[:n])
        return [ALLOWED_COLORS[0]]

    # -- steps -------------------------------------------------------------

    def _mark(self, step: str, channels=None):
        for ch in (channels or self.channels):
            self.correction_log[ch][step] = True

    def _done(self, step: str, channels=None) -> bool:
        return all(self.correction_log[ch].get(step, False)
                   for ch in (channels or self.channels))

    def _load_image(self) -> "DaxProcesser":
        if self.ims:
            return self
        movie, _ = read_dax(self.filename)
        stacks = split_channels(movie, self.channels, self.all_channels,
                                n_z=self.single_im_size[0],
                                buffer_frames=self.num_buffer_frames,
                                empty_frames=self.num_empty_frames)
        self.ims = {ch: np.asarray(s, np.float32)
                    for ch, s in zip(self.channels, stacks)}
        self._mark("load")
        return self

    def _corr_hot_pixels_3D(self, hot_pixel_th: float = 0.5,
                            hot_th: float = 4.0) -> "DaxProcesser":
        if self._done("hot_pixel"):
            return self
        for ch in self.channels:
            self.ims[ch] = np.asarray(remove_hot_pixels(
                self.ims[ch], hot_pix_th=hot_pixel_th, hot_th=hot_th))
        self._mark("hot_pixel")
        return self

    def _corr_Z_shift(self) -> "DaxProcesser":
        if self._done("z_shift"):
            return self
        for ch in self.channels:
            self.ims[ch] = np.asarray(z_shift_correct(self.ims[ch]))
        self._mark("z_shift")
        return self

    def _corr_illumination(self, profiles: Dict[str, np.ndarray]
                           ) -> "DaxProcesser":
        for ch in self.channels:
            if self.correction_log[ch].get("illumination") or \
                    ch not in profiles:
                continue
            self.ims[ch] = np.clip(np.asarray(illumination_correct(
                self.ims[ch], np.asarray(profiles[ch], np.float32))),
                0, 65535)
            self.correction_log[ch]["illumination"] = True
        return self

    def _corr_bleedthrough(self, profile: np.ndarray,
                           channels: Optional[Sequence[str]] = None
                           ) -> "DaxProcesser":
        chs = list(channels or self.channels)
        if all(self.correction_log[c].get("bleedthrough") for c in chs):
            return self
        stack = np.stack([self.ims[c] for c in chs])
        out = np.asarray(bleedthrough_unmix(
            stack, np.asarray(profile, np.float32)))
        for i, c in enumerate(chs):
            self.ims[c] = np.clip(out[i], 0, 65535)
            self.correction_log[c]["bleedthrough"] = True
        return self

    def _gaussian_highpass(self, sigma: float = 3.0,
                           truncate: float = 2.0) -> "DaxProcesser":
        if self._done("highpass"):
            return self
        for ch in self.channels:
            self.ims[ch] = np.asarray(gaussian_highpass(
                self.ims[ch], sigma, truncate))
        self._mark("highpass")
        return self

    def _calculate_drift(self, ref_im: np.ndarray,
                         drift_channel: Optional[str] = None,
                         **align_kwargs) -> np.ndarray:
        ch = drift_channel or self.channels[-1]
        drift, flag = align_image(self.ims[ch], np.asarray(ref_im),
                                  **align_kwargs)
        self.drift = np.asarray(drift)
        self.drift_flag = int(np.asarray(flag))
        return self.drift

    def _warp_image(self, channels: Optional[Sequence[str]] = None,
                    chromatic_constants: Optional[Dict[str, np.ndarray]]
                    = None) -> "DaxProcesser":
        drift = self.drift if self.drift is not None else np.zeros(3)
        for ch in (channels or self.channels):
            if self.correction_log[ch].get("warp"):
                continue
            consts = (chromatic_constants or {}).get(ch)
            self.ims[ch] = np.asarray(warp_image(
                self.ims[ch], np.asarray(drift, np.float32),
                None if consts is None else np.asarray(consts, np.float32),
                None if consts is None else np.asarray(
                    [s / 2 for s in self.single_im_size], np.float32)))
            self.correction_log[ch]["warp"] = True
        return self

    def _fit_spots(self, channels: Optional[Sequence[str]] = None,
                   **fit_kwargs) -> Dict[str, FitResult]:
        out = {}
        for ch in (channels or self.channels):
            out[ch] = fit_fov_image(self.ims[ch], **fit_kwargs)
        self.spots = out
        return out

    def _fit_spots_by_segmentation(self, channel: str,
                                   seg_label: np.ndarray,
                                   th_seed: float = 500.0,
                                   num_spots: Optional[int] = None,
                                   segment_search_radius: int = 3,
                                   **fit_kwargs
                                   ) -> Tuple[np.ndarray, np.ndarray]:
        """Fit spots per segmented cell (reference
        DaxProcesser._fit_spots_by_segmentation,
        classes/preprocess.py:1093-1152).  Returns (spots, cell_ids) and
        stores them as `spots_<ch>` / `spots_cell_ids_<ch>`."""
        from ..ops.cell_fitting import fit_spots_by_segmentation

        spots, cell_ids = fit_spots_by_segmentation(
            self.ims[channel], seg_label, th_seed=th_seed,
            num_spots=num_spots,
            segment_search_radius=segment_search_radius,
            drift=self.drift, **fit_kwargs)
        setattr(self, f"spots_{channel}", spots)
        setattr(self, f"spots_cell_ids_{channel}", cell_ids)
        return spots, cell_ids

    def _correct_spot_coords(self, spots_zxy: np.ndarray,
                             channel: str,
                             chromatic_constants: Optional[Dict[str,
                                                                np.ndarray]]
                             = None) -> np.ndarray:
        """Chromatic+drift correction applied to coordinates (the modern
        warp_image=False path)."""
        drift = self.drift if self.drift is not None else np.zeros(3)
        consts = (chromatic_constants or {}).get(channel)
        if consts is None:
            consts = np.zeros((3, 10), np.float32)
        center = np.asarray([s / 2 for s in self.single_im_size],
                            np.float32)
        return np.asarray(warp_spot_coords(
            np.asarray(spots_zxy, np.float32),
            np.asarray(consts, np.float32), center,
            np.asarray(drift, np.float32)))


def batch_process_image_quick(dax_filename: str,
                              correction_folder: Optional[str],
                              sel_channels: Sequence[str],
                              corr_hot_pixels: bool = True,
                              corr_illumination: bool = True,
                              verbose: bool = False,
                              **dax_kwargs) -> Dict[str, np.ndarray]:
    """Quick DaxProcesser application (reference
    batch_process_image_quick, classes/preprocess.py:1257+): load the
    selected channels, apply hot-pixel and illumination corrections,
    return the per-channel stacks.  Illumination profiles load from
    `correction_folder` by the reference naming convention and are
    skipped (with a note when verbose) if absent.  Extra kwargs
    (all_channels, single_im_size, num_buffer_frames, ...) pass through
    to DaxProcesser for files whose geometry auto-detection can't
    infer."""
    from ..io.profiles_io import load_correction_profile

    proc = DaxProcesser(dax_filename, correction_channels=sel_channels,
                        verbose=verbose, **dax_kwargs)
    proc._load_image()
    if corr_hot_pixels:
        proc._corr_hot_pixels_3D()
    if corr_illumination and correction_folder:
        profiles: Dict[str, np.ndarray] = {}
        for ch in sel_channels:
            try:
                profiles.update(load_correction_profile(
                    "illumination", correction_folder,
                    corr_channels=[ch], im_size=proc.single_im_size))
            except FileNotFoundError:
                if verbose:
                    print(f"-- skip illumination for {ch} (no profile)")
        proc._corr_illumination(profiles)
    return proc.ims
