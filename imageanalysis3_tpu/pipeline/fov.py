"""Per-FOV processing pipeline: correct -> register -> fit -> spot table.

Behavior target: the reference's per-(dax, channels) worker
``batch_process_image_to_spots`` (classes/batch_functions.py:60-302) driving
``correct_fov_image`` (io_tools/load.py:166-521) and ``fit_fov_image``
(spot_tools/fitting.py:169-262), fanned out with ``mp.Pool``
(classes/field_of_view.py:1128-1142).

TPU-first design: one hybridization round = one jitted program over the
whole (C, Z, X, Y) stack — fused corrections, 8-crop drift consensus
against the reference round, per-channel seeding + batched LM fitting, and
chromatic+drift correction applied to the fitted *coordinates* (the modern
reference path, warp_image=False).  Multi-round batches are sharded over a
device mesh with `shard_map` (data parallelism over rounds — the TPU
equivalent of the reference's process pool), so one program processes an
experiment.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import ExperimentConfig
from ..ops.corrections import correct_channel_stack
from ..ops.drift import (generate_drift_crops, subpixel_phase_correlation,
                         subpixel_phase_correlation_prepared,
                         prepare_ref_spectrum, consensus_drift)
from ..ops.seeding import get_seeds
from ..ops.gaussian_fit import iter_fit_seed_points
from ..ops.warp import warp_spot_coords


class RoundResult(NamedTuple):
    """Spot tables for one hybridization round of one FOV."""

    spots: jnp.ndarray       # (C, N, 11) natural rows, coords drift+chrom corrected
    raw_spots: jnp.ndarray   # (C, N, 11) as fitted (uncorrected coords)
    valid: jnp.ndarray       # (C, N) bool
    drift: jnp.ndarray       # (3,) zxy px
    drift_flag: jnp.ndarray  # () int32: 0 consensus, 1 fallback


def _crop(im, b):
    return im[b[0][0]:b[0][1], b[1][0]:b[1][1], b[2][0]:b[2][1]]


class FovPipeline:
    """Compiled per-round FOV processor.

    Parameters
    ----------
    cfg : ExperimentConfig (static; hashable)
    n_channels : number of data channels in the stack (drift channel last
        by convention of `channel_order`)
    drift_channel_index : which channel drives registration (reference
        default '488' beads, classes/field_of_view.py)
    illumination / bleed / chromatic_constants : optional profile arrays
        ((C, X, Y), (C, C, X, Y), (C, 3, n_monomials)); None disables.
    """

    def __init__(self, cfg: ExperimentConfig, n_channels: int,
                 drift_channel_index: int,
                 fit_channel_indices: Tuple[int, ...],
                 illumination: Optional[np.ndarray] = None,
                 bleed: Optional[np.ndarray] = None,
                 chromatic_constants: Optional[np.ndarray] = None,
                 chromatic_ref_center: Optional[np.ndarray] = None,
                 image_shape: Optional[Tuple[int, int, int]] = None,
                 seed_thresholds: Optional[np.ndarray] = None):
        self.cfg = cfg
        self.n_channels = int(n_channels)
        self.drift_idx = int(drift_channel_index)
        self.fit_idx = tuple(int(i) for i in fit_channel_indices)
        self.illumination = (None if illumination is None
                             else jnp.asarray(illumination, jnp.float32))
        self.bleed = None if bleed is None else jnp.asarray(bleed, jnp.float32)
        shape = tuple(image_shape or cfg.image_size)
        self.image_shape = shape
        self.crops = tuple(
            tuple(tuple(int(v) for v in ax) for ax in b)
            for b in generate_drift_crops(shape, cfg.drift.drift_size))
        if chromatic_constants is None:
            n_mono = 10
            chromatic_constants = np.zeros(
                (self.n_channels, 3, n_mono), np.float32)
        self.chromatic = jnp.asarray(chromatic_constants, jnp.float32)
        if chromatic_ref_center is None:
            chromatic_ref_center = np.array(
                [shape[0] / 2, shape[1] / 2, shape[2] / 2], np.float32)
        self.chrom_center = jnp.asarray(chromatic_ref_center, jnp.float32)
        if seed_thresholds is None:
            seed_thresholds = np.full(self.n_channels, cfg.seed.th_seed,
                                      np.float32)
        self.seed_thresholds = jnp.asarray(seed_thresholds, jnp.float32)
        self._raw_programs = {}
        self._process = self._build()

    # -- program construction -------------------------------------------

    def _build(self):
        cfg = self.cfg
        corr = cfg.correction
        seed_cfg = cfg.seed
        fit_cfg = cfg.fit
        crops = self.crops
        drift_idx = self.drift_idx
        fit_idx = self.fit_idx

        def correct(ims):
            return correct_channel_stack(
                ims,
                bleed_profile=self.bleed,
                illumination_profile=self.illumination,
                hot_pixel=corr.hot_pixel,
                hot_pixel_th=corr.hot_pixel_th,
                hot_pixel_ratio=corr.hot_pixel_ratio,
                z_shift=corr.z_shift,
                do_bleedthrough=corr.bleedthrough and self.bleed is not None,
                do_illumination=(corr.illumination
                                 and self.illumination is not None),
                do_highpass=corr.gaussian_highpass,
                highpass_sigma=corr.highpass_sigma,
                highpass_truncate=corr.highpass_truncate,
                median_subsample=getattr(corr, "median_subsample", 1),
                clip_min=corr.clip_min,
                clip_max=corr.clip_max,
                # multi-channel production stacks (3 x 1 GB f32 at
                # 2048^2x60) overflow HBM if per-channel temps are
                # batched; one channel at a time costs nothing at
                # bandwidth-bound sizes
                sequential_channels=self.n_channels > 1,
            )

        def ref_spectra(ref_im):
            """Per-crop conditioned rFFT spectra of the reference round —
            loop-invariant across hyb rounds, so the driver computes them
            once per FOV (prepare_reference) instead of per round."""
            ref_b = jnp.stack([_crop(ref_im, b) for b in crops])
            return jax.vmap(lambda r: prepare_ref_spectrum(
                r, subtract_mean=cfg.drift.subtract_mean,
                window=cfg.drift.window))(ref_b)

        def drift_of(src_im, ref):
            src_b = jnp.stack([_crop(src_im, b) for b in crops])
            # `ref` is either the corrected reference image (3D) or the
            # prepared per-crop spectra (4D complex)
            spectra = ref if ref.ndim == 4 else ref_spectra(ref)

            def one(s, fr):
                return subpixel_phase_correlation_prepared(
                    fr, s, upsample_factor=cfg.drift.upsample_factor,
                    subtract_mean=cfg.drift.subtract_mean,
                    window=cfg.drift.window)

            # two-phase consensus, the reference's early exit
            # (correction_tools/alignment.py:624-674: stop when >=
            # min_good_drifts crops agree): register the first
            # `phase1_crops` crops batched via vmap; only when they
            # disagree does the cond branch spend FFTs on the rest.
            k = len(crops)
            k1 = min(k, max(cfg.drift.min_good_drifts,
                            getattr(cfg.drift, "phase1_crops", k // 2)))
            drifts1 = jax.vmap(one)(src_b[:k1], spectra[:k1])
            out1, flag1 = consensus_drift(
                drifts1, drift_diff_th=cfg.drift.good_drift_th,
                min_good_drifts=cfg.drift.min_good_drifts)
            if k1 == k:
                return out1, flag1

            def rest(_):
                drifts2 = jax.vmap(one)(src_b[k1:], spectra[k1:])
                return consensus_drift(
                    jnp.concatenate([drifts1, drifts2]),
                    drift_diff_th=cfg.drift.good_drift_th,
                    min_good_drifts=cfg.drift.min_good_drifts)

            return jax.lax.cond(flag1 == 0,
                                lambda _: (out1, flag1), rest,
                                operand=None)

        self._ref_spectra = jax.jit(ref_spectra)

        def fit_channel(im, th_seed):
            seeds = get_seeds(
                im,
                max_num_seeds=seed_cfg.max_num_seeds,
                th_seed=th_seed,
                gfilt_size=seed_cfg.gfilt_size,
                background_gfilt_size=seed_cfg.background_gfilt_size,
                filt_size=seed_cfg.filt_size,
                min_edge_distance=seed_cfg.min_edge_distance,
                use_dynamic_th=seed_cfg.use_dynamic_th,
                dynamic_niters=seed_cfg.dynamic_niters,
                min_dynamic_seeds=seed_cfg.min_dynamic_seeds,
                cand_capacity=seed_cfg.cand_capacity,
                pyramid_bg=getattr(seed_cfg, "pyramid_bg", False),
            )
            res = iter_fit_seed_points(
                im, seeds.coords.astype(jnp.float32), seeds.valid,
                radius=fit_cfg.radius, min_w=fit_cfg.min_w,
                max_w=fit_cfg.max_w, init_w=fit_cfg.init_w,
                min_delta_center=fit_cfg.min_delta_center,
                max_delta_center=fit_cfg.max_delta_center,
                lm_iters=fit_cfg.lm_iters, n_max_iter=fit_cfg.n_max_iter,
                max_dist_th=fit_cfg.max_dist_th,
                max_neighbors=fit_cfg.max_neighbors)
            return res.spots, res.valid

        # bleedthrough is the only stage that mixes channels; without it
        # each channel corrects independently, so the round program can
        # STREAM channels — correct one, fit it, let XLA free its 1 GB
        # volume before the next — instead of holding the full (C, Z, X, Y)
        # corrected stack (3 GB at production scale) live across every fit.
        # With bleedthrough enabled the batched path remains (its unmix
        # einsum needs all channels at once).
        streaming = not (corr.bleedthrough and self.bleed is not None)

        def correct_one(im, ci):
            """Correct a single channel (static index `ci` selects its
            illumination profile); no cross-channel stages."""
            illum = (self.illumination[ci][None]
                     if self.illumination is not None else None)
            return correct_channel_stack(
                im[None],
                illumination_profile=illum,
                hot_pixel=corr.hot_pixel,
                hot_pixel_th=corr.hot_pixel_th,
                hot_pixel_ratio=corr.hot_pixel_ratio,
                z_shift=corr.z_shift,
                do_bleedthrough=False,
                do_illumination=(corr.illumination
                                 and self.illumination is not None),
                do_highpass=corr.gaussian_highpass,
                highpass_sigma=corr.highpass_sigma,
                highpass_truncate=corr.highpass_truncate,
                median_subsample=getattr(corr, "median_subsample", 1),
                clip_min=corr.clip_min,
                clip_max=corr.clip_max,
            )[0]

        def process_full(ims, ref_im, th_seeds):
            """ims: (C, Z, X, Y) raw; ref_im: (Z, X, Y) corrected reference
            drift-channel image; th_seeds: (C,) per-channel thresholds.
            Returns (RoundResult, corrected drift-channel stack)."""
            if streaming:
                corr_drift = correct_one(ims[drift_idx], drift_idx)
                channel_of = (lambda ci: corr_drift if ci == drift_idx
                              else correct_one(ims[ci], ci))
            else:
                corrected = correct(ims)
                corr_drift = corrected[drift_idx]
                channel_of = lambda ci: corrected[ci]
            drift, flag = drift_of(corr_drift, ref_im)
            spots_list, valid_list, corr_list = [], [], []
            for ci in fit_idx:
                sp, va = fit_channel(channel_of(ci), th_seeds[ci])
                spots_list.append(sp)
                valid_list.append(va)
                new_coords = warp_spot_coords(
                    sp[:, 1:4], self.chromatic[ci], self.chrom_center, drift)
                corr_list.append(sp.at[:, 1:4].set(new_coords))
            raw = jnp.stack(spots_list)
            corrected_spots = jnp.stack(corr_list)
            valid = jnp.stack(valid_list)
            return RoundResult(spots=corrected_spots, raw_spots=raw,
                               valid=valid, drift=drift,
                               drift_flag=flag), corr_drift

        def process(ims, ref_im, th_seeds):
            return process_full(ims, ref_im, th_seeds)[0]

        # the donated raw stack has no matching output to alias, so jax
        # warns on every call; the donation still lets XLA recycle the
        # buffer for intermediates, which is the point — silence the noise
        import warnings
        warnings.filterwarnings(
            "ignore", message="Some donated buffers were not usable")

        # unjitted round program, reused by the raw-input variant
        # (process_round_raw jits deinterleave + this in one program)
        self._process_fn = process

        # per-stage jitted programs for the structured timing breakdown
        # (SURVEY §5: replace the reference's `verbose` prints with a
        # per-stage timing record)
        self.correct_jit = jax.jit(correct)
        # streaming-mode reference correction: only the drift channel's
        # volume is ever needed from the reference round
        self._correct_drift_only = (
            jax.jit(lambda im: correct_one(im, drift_idx))
            if streaming else None)
        self.drift_jit = jax.jit(drift_of)
        self.fit_jit = jax.jit(fit_channel)
        # sequential-drift mode needs the corrected drift channel back as
        # the next round's registration target — one program, no second
        # correction pass (jit compiles lazily, so the unused variant in
        # either mode costs nothing)
        self._process_ref = jax.jit(process_full, donate_argnums=(0,))
        # the raw stack is consumed by the first correction stage; donating
        # it keeps only one copy of the FOV live in HBM per dispatch
        return jax.jit(process, donate_argnums=(0,))

    # -- public API -------------------------------------------------------

    def correct_reference(self, ref_ims: jnp.ndarray) -> jnp.ndarray:
        """Correct the reference round and return its drift-channel image
        (reference Field_of_View._load_reference_image :734-801)."""
        corr = self.cfg.correction
        if self._correct_drift_only is not None:
            # no cross-channel stage: correct only the drift channel
            # (1 GB live instead of C GB at production scale)
            return self._correct_drift_only(
                jnp.asarray(ref_ims)[self.drift_idx])
        out = correct_channel_stack(
            jnp.asarray(ref_ims),
            bleed_profile=self.bleed,
            illumination_profile=self.illumination,
            hot_pixel=corr.hot_pixel, hot_pixel_th=corr.hot_pixel_th,
            hot_pixel_ratio=corr.hot_pixel_ratio, z_shift=corr.z_shift,
            do_bleedthrough=corr.bleedthrough and self.bleed is not None,
            do_illumination=(corr.illumination
                             and self.illumination is not None),
            do_highpass=corr.gaussian_highpass,
            highpass_sigma=corr.highpass_sigma,
            highpass_truncate=corr.highpass_truncate,
            median_subsample=getattr(corr, "median_subsample", 1),
            clip_min=corr.clip_min, clip_max=corr.clip_max,
            sequential_channels=self.n_channels > 1)
        return out[self.drift_idx]

    def prepare_reference(self, ref_im) -> jnp.ndarray:
        """Per-crop drift spectra of the corrected reference image —
        compute once per FOV, pass to `process_round` in place of the
        image (halves each round's forward-FFT work)."""
        return self._ref_spectra(jnp.asarray(ref_im))

    def process_round(self, ims, ref_im) -> RoundResult:
        """Process one round's (C, Z, X, Y) stack against the reference
        (either the corrected image or `prepare_reference` spectra)."""
        return self._process(jnp.asarray(ims), jnp.asarray(ref_im),
                             self.seed_thresholds)

    def process_round_raw(self, raw, ref_im, rel_starts, n_colors,
                          donate: bool = True) -> RoundResult:
        """Process one round from the RAW interleaved frame window
        (io.dax.read_raw_window): the de-interleave runs ON DEVICE as
        static strided slices fused into the round program
        (ops.corrections.deinterleave_stack), so the host input path is
        a pure sequential read.  `rel_starts`/`n_colors` come from
        io.dax.raw_frame_window for this round's channel layout.
        `donate=False` keeps the raw block alive (benchmark reuse);
        production streams fresh uploads and donates."""
        key = (tuple(int(s) for s in rel_starts), int(n_colors),
               bool(donate))
        prog = self._raw_programs.get(key)
        if prog is None:
            from ..ops.corrections import deinterleave_stack
            n_z = self.image_shape[0]

            def process_raw(raw_block, ref, th_seeds):
                ims = deinterleave_stack(raw_block, key[0], key[1], n_z)
                return self._process_fn(ims, ref, th_seeds)

            prog = jax.jit(process_raw,
                           donate_argnums=(0,) if donate else ())
            self._raw_programs[key] = prog
        return prog(jnp.asarray(raw), jnp.asarray(ref_im),
                    self.seed_thresholds)

    def process_round_returning_ref(self, ims, ref_im
                                    ) -> Tuple[RoundResult, jnp.ndarray]:
        """`process_round` that also returns the corrected drift-channel
        stack, for sequential drift mode where each round is the next
        round's registration target — avoids the reference re-correction
        the driver would otherwise run (one correction per round)."""
        return self._process_ref(jnp.asarray(ims), jnp.asarray(ref_im),
                                 self.seed_thresholds)

    def process_rounds(self, ims, ref_im, mesh: Optional[Mesh] = None,
                       ) -> RoundResult:
        """Process (R, C, Z, X, Y) rounds; optionally sharded over `mesh`.

        With a mesh, rounds are data-parallel across devices (`shard_map`
        over the leading axis) — the TPU-native replacement for the
        reference's mp.Pool fan-out (classes/field_of_view.py:1128-1142).
        """
        ims = jnp.asarray(ims)
        th = self.seed_thresholds
        ref_im = jnp.asarray(ref_im)

        def per_round(im):
            return self._process(im, ref_im, th)

        if mesh is None:
            return jax.lax.map(per_round, ims)

        n_dev = mesh.devices.size
        r = ims.shape[0]
        pad = (-r) % n_dev
        ims_p = jnp.pad(ims, ((0, pad),) + ((0, 0),) * (ims.ndim - 1))

        @partial(shard_map, mesh=mesh, in_specs=(P("data"), P(), P()),
                 out_specs=P("data"))
        def sharded(ims_local, ref_local, th_local):
            def f(im):
                return self._process(im, ref_local, th_local)
            return jax.lax.map(f, ims_local)

        out = sharded(ims_p, ref_im, th)
        return jax.tree.map(lambda x: x[:r], out)
