"""Full-pipeline benchmark at reference scale: raw stacks -> corrected ->
registered -> fitted -> MERFISH-decoded -> homolog-EM-picked traces.

The one measured artifact VERDICT r4 item 2 asked for: 2048^2 x 60
stacks, 3 channels/round (2 data + 1 bead), 20 hybridization rounds =
40 readout bits, decoded against a pair-unique codebook
(reference batch_decode_BB_like, classes/decode.py:2139-2199) into
per-chromosome homolog traces, with per-stage seconds in one JSON line.

Scene: 6 chromosomes x 25 regions x 2 homologs (3-on-bit codes over the
40 bits; every bit pair maps to at most one region, the reference's
valid-pair table invariant, classes/decode.py:177-205).  Each round's
two data channels carry that round's two bits' true spots plus ~1.5k
distractor spots (production spot density — the fit stage sees ~1.5k
spots/channel, the decoder ~60k candidates, matching the r3 52k-spot
decode scale); the bead channel carries a drifted bead field.

Transfer discipline: all stacks render ON DEVICE from KBs of spot
parameters (synthetic.render_spots_device) — uploading ~30 GB through
the axon tunnel would add an hour without changing what is measured.
Rendering occupies the device, so the align+fit stage is timed per
dispatch (render excluded and reported separately); on a production
host the reads overlap instead (bench_io.py measures that overlap).

Prints ONE JSON line; run directly: `python bench_e2e.py`.
"""

import json
import sys
import time

import numpy as np

SHAPE = (60, 2048, 2048)
N_ROUNDS = 20
N_DATA_CH = 2                     # bits per round
N_BITS = N_ROUNDS * N_DATA_CH
N_CHR = 6
N_PER_CHR = 25
N_ON = 3
N_HOMOLOGS = 2
N_DISTRACTORS = 1500              # per data channel per round
PX = np.array([200.0, 108.0, 108.0])   # nm per px (z, x, y)


def _note(msg):
    print(f"[bench_e2e +{time.perf_counter() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.perf_counter()


def make_codebook(rng):
    """Pair-unique 3-on-bit codebook: 150 regions over 40 bits
    (reference valid-pair invariant, classes/decode.py:177-205)."""
    import pandas as pd

    rows, used = [], set()
    tries = 0
    while len(rows) < N_CHR * N_PER_CHR and tries < 200_000:
        tries += 1
        on = tuple(sorted(rng.choice(N_BITS, N_ON, replace=False)))
        pairs = {(a, b) for i, a in enumerate(on) for b in on[i + 1:]}
        if pairs & used:
            continue
        used |= pairs
        rows.append(on)
    if len(rows) < N_CHR * N_PER_CHR:
        raise RuntimeError("codebook packing failed")
    data = {"id": np.arange(len(rows)) + 100,
            "name": [f"reg{i}" for i in range(len(rows))],
            "chr": [f"chr{c + 1}" for c in range(N_CHR)
                    for _ in range(N_PER_CHR)]}
    for b in range(N_BITS):
        data[str(b + 1)] = [int(b in on) for on in rows]
    return pd.DataFrame(data), rows


def make_scene(rng, codebook_rows):
    """Plant truth: 12 homolog territories on a grid, polymer-walk
    region positions (px), per-bit spot jitter applied at render time."""
    territories = {}
    k = 0
    for c in range(N_CHR):
        for h in range(N_HOMOLOGS):
            gx, gy = divmod(k, 4)
            territories[(c, h)] = np.array(
                [30.0, 330 + gx * 480, 330 + gy * 480])
            k += 1
    # truth[(chr, homolog)] = (N_PER_CHR, 3) px positions
    truth = {}
    for c in range(N_CHR):
        for h in range(N_HOMOLOGS):
            steps = rng.normal(0, 1, (N_PER_CHR, 3)) * [2.0, 22.0, 22.0]
            walk = territories[(c, h)] + np.cumsum(steps, axis=0)
            walk[:, 0] = np.clip(walk[:, 0], 10, 50)
            walk[:, 1:] = np.clip(walk[:, 1:], 60, 1988)
            truth[(c, h)] = walk
    # per-bit spot lists: bit -> (M, 3) px centers
    bit_spots = {b: [] for b in range(N_BITS)}
    for gi, on in enumerate(codebook_rows):
        c, r = divmod(gi, N_PER_CHR)
        for h in range(N_HOMOLOGS):
            pos = truth[(c, h)][r]
            for b in on:
                bit_spots[b].append(pos + rng.normal(0, 0.4, 3))
    return truth, {b: np.asarray(v) for b, v in bit_spots.items()}


def main():
    import os

    import jax
    import jax.numpy as jnp

    from imageanalysis3_tpu.config import (ExperimentConfig, SeedConfig,
                                           FitConfig, DriftConfig)
    from imageanalysis3_tpu.decode.dna_decoder import DNAMerfishDecoder
    from imageanalysis3_tpu.pipeline import FovPipeline
    from imageanalysis3_tpu import synthetic as syn

    decode_only = ("--decode-only" in sys.argv
                   and os.path.exists("/tmp/bench_e2e_spots.npz"))
    rng = np.random.default_rng(42)
    codebook_df, rows = make_codebook(rng)
    truth, bit_spots = make_scene(rng, rows)
    _note(f"codebook {len(rows)} regions / {N_BITS} bits; scene planted")

    if decode_only:
        # deterministic scene (seed 42) + cached fitted table: decode-stage
        # iterations skip the round loop but report its cached timings
        with np.load("/tmp/bench_e2e_spots.npz") as fh:
            spots, bits = fh["spots"], fh["bits"]
            t_proc, t_render = list(fh["t_proc"]), list(fh["t_render"])
            drift_errs = list(fh["drift_errs"])
        t_compile = 0.0
        _note(f"decode-only: {len(spots)} cached candidate spots")
        return _decode_and_report(truth, codebook_df, spots, bits,
                                  t_proc, t_render, drift_errs, t_compile)

    bead_truth = syn.sample_spot_params(SHAPE, 120, rng,
                                        min_separation=14.0,
                                        height_range=(2000.0, 5000.0),
                                        sigma_jitter=0.0)
    drifts = np.vstack([np.zeros(3),
                        rng.uniform(-4, 4, (N_ROUNDS - 1, 3))]).round()
    distractors = {
        (r, ci): np.column_stack([
            rng.uniform(6, SHAPE[0] - 6, N_DISTRACTORS),
            rng.uniform(20, SHAPE[1] - 20, N_DISTRACTORS),
            rng.uniform(20, SHAPE[2] - 20, N_DISTRACTORS)])
        for r in range(N_ROUNDS) for ci in range(N_DATA_CH)}

    cfg = ExperimentConfig(
        image_size=SHAPE,
        seed=SeedConfig(th_seed=300.0, max_num_seeds=4096,
                        cand_capacity=16384),
        fit=FitConfig(),
        drift=DriftConfig(),
    )
    pipe = FovPipeline(cfg, n_channels=N_DATA_CH + 1,
                       drift_channel_index=N_DATA_CH,
                       fit_channel_indices=tuple(range(N_DATA_CH)),
                       image_shape=SHAPE)

    def round_stack(r):
        d = drifts[r]
        chans = []
        for ci in range(N_DATA_CH):
            b = r * N_DATA_CH + ci
            centers = np.vstack([bit_spots[b], distractors[(r, ci)]])
            heights = np.concatenate([
                np.full(len(bit_spots[b]), 0.0) + 1800.0
                + 600.0 * np.sin(np.arange(len(bit_spots[b]))),
                np.random.default_rng(7000 + b).uniform(
                    500, 2500, N_DISTRACTORS)])
            im = syn.render_spots_device(SHAPE, centers + d, heights,
                                         background=150.0)
            chans.append(syn.noisy_uint16_device(im, seed=3000 + b,
                                                 read_noise=12.0))
        bead = syn.render_spots_device(
            SHAPE, bead_truth["centers"] + d, bead_truth["heights"],
            background=120.0)
        chans.append(syn.noisy_uint16_device(bead, seed=1000 + r))
        return jnp.stack(chans)

    _note("rendering reference round + compiling")
    t0 = time.perf_counter()
    ref = round_stack(0)
    jax.block_until_ready(ref)
    ref_im = pipe.prepare_reference(pipe.correct_reference(ref))
    del ref                     # 1.5 GB raw stack, not needed again
    res0 = pipe.process_round(round_stack(0), ref_im)
    jax.block_until_ready((ref_im, res0))
    t_compile = time.perf_counter() - t0
    _note(f"compiled ({t_compile:.0f}s); streaming {N_ROUNDS} rounds")

    # per-round: render (device-occupying synthesis, reported separately)
    # then the timed process dispatch — raw uint16 stack in, spot table out
    all_spots, all_bits = [], []
    t_render, t_proc = [], []
    drift_errs = []
    for r in range(N_ROUNDS):
        t0 = time.perf_counter()
        ims = round_stack(r)
        jax.block_until_ready(ims)
        t_render.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        res = pipe.process_round(ims, ref_im)
        jax.block_until_ready(res)
        t_proc.append(time.perf_counter() - t0)
        drift_errs.append(float(np.linalg.norm(
            np.asarray(res.drift) + drifts[r])))
        for ci in range(N_DATA_CH):
            sp = np.asarray(res.spots[ci])
            va = np.asarray(res.valid[ci])
            all_spots.append(sp[va])
            # codebook bit columns are 1-based ("1".."40")
            all_bits.append(np.full(int(va.sum()),
                                    r * N_DATA_CH + ci + 1))
        if r % 5 == 0:
            _note(f"round {r}: proc {t_proc[-1]:.3f}s, "
                  f"{int(sum(len(s) for s in all_spots))} spots so far")
    spots = np.concatenate(all_spots).astype(np.float32)
    bits = np.concatenate(all_bits)
    # cache the fitted table so decode-stage iterations skip the ~25 min
    # round loop: `python bench_e2e.py --decode-only` reuses it
    np.savez("/tmp/bench_e2e_spots.npz", spots=spots, bits=bits,
             t_proc=np.asarray(t_proc), t_render=np.asarray(t_render),
             drift_errs=np.asarray(drift_errs))
    _decode_and_report(truth, codebook_df, spots, bits, t_proc, t_render,
                       drift_errs, t_compile)


def _decode_and_report(truth, codebook_df, spots, bits, t_proc, t_render,
                       drift_errs, t_compile):
    from imageanalysis3_tpu.decode.dna_decoder import DNAMerfishDecoder

    t_align_fit = float(np.sum(t_proc))
    _note(f"align+fit {t_align_fit:.1f}s for {N_ROUNDS} rounds "
          f"({len(spots)} candidate spots); decoding")

    # decode + homolog EM picking (reference batch_decode_BB_like chain).
    # Timed twice: the first call compiles the shape-bucketed programs
    # (paid once per experiment); the steady-state call is what every
    # subsequent cell costs.  The steady-state inputs are jittered by
    # 1e-3 px so the axon tunnel's result cache cannot satisfy the call
    # without executing.
    dec = DNAMerfishDecoder(codebook_df, pair_search_radius=250.0,
                            keep_ratio_th=0.2)
    t0 = time.perf_counter()
    out = dec.decode(spots, bits)
    t_decode_first = time.perf_counter() - t0
    assert out is not None, "keep-ratio gate tripped"
    first_stage_seconds = dict(dec.stage_seconds)

    jit_spots = spots.copy()
    jit_spots[:, 1:4] += np.float32(1e-3)
    t0 = time.perf_counter()
    out = dec.decode(jit_spots, bits)
    t_decode = time.perf_counter() - t0
    assert out is not None

    # trace accuracy vs planted truth (homolog permutation resolved per
    # chromosome by total distance)
    errs_nm, n_assigned, n_regions = [], 0, 0
    for c in range(N_CHR):
        res = out.get(f"chr{c + 1}")
        n_regions += N_PER_CHR * N_HOMOLOGS
        if res is None:
            continue
        zxys = np.asarray(res.zxys)            # (H, R, 3) nm
        okz = np.asarray(res.zxys_valid)
        t_nm = np.stack([truth[(c, h)] * PX for h in range(N_HOMOLOGS)])
        perms = ([(0, 1), (1, 0)] if N_HOMOLOGS == 2
                 else [tuple(range(N_HOMOLOGS))])
        best = None
        for perm in perms:
            d = np.linalg.norm(zxys - t_nm[list(perm)], axis=-1)
            tot = np.nansum(np.where(okz, d, np.nan))
            if best is None or tot < best[0]:
                best = (tot, d)
        d = best[1]
        errs_nm.extend(d[okz].tolist())
        n_assigned += int(okz.sum())

    med_err_nm = float(np.median(errs_nm)) if errs_nm else float("nan")
    total = t_align_fit + t_decode
    out_json = {
        "metric": "20-round 2048^2x60 3-channel raw->corrected->"
                  "registered->fit->MERFISH-decoded->homolog-EM traces",
        "value": round(total, 3),
        "unit": "seconds",
        "vs_baseline": None,
        "extra": {
            "align_fit_seconds": round(t_align_fit, 3),
            "align_fit_s_per_round_median": round(
                float(np.median(t_proc)), 4),
            "rounds_per_second": round(N_ROUNDS / t_align_fit, 2),
            "decode_seconds": round(t_decode, 3),
            "decode_tuples_seconds": round(
                dec.stage_seconds["tuples"], 3),
            "decode_homolog_seconds": round(
                dec.stage_seconds["homolog"], 3),
            "decode_first_call_seconds": round(t_decode_first, 3),
            "decode_first_call_note": "includes one-time program "
                "compiles; bucketed shapes (spot_bucket/group_bucket) "
                "make every later cell hit this cache",
            "decode_first_stage_seconds": {
                k: round(v, 3) for k, v in first_stage_seconds.items()},
            "candidate_spots": int(len(spots)),
            "regions_assigned": n_assigned,
            "regions_total": n_regions,
            "median_trace_err_nm": round(med_err_nm, 2),
            "median_trace_err_px_xy": round(med_err_nm / PX[1], 4)
                if errs_nm else None,
            "median_drift_err_px": round(float(np.median(drift_errs)), 4),
            "render_s_per_round_median": round(
                float(np.median(t_render)), 3),
            "render_note": "on-device synthesis (excluded from value; "
                           "production overlaps host reads instead — "
                           "see bench_io.py)",
            "compile_seconds": round(t_compile, 1),
            "n_rounds": N_ROUNDS,
            "n_bits": N_BITS,
            "chromosomes": N_CHR,
            "regions_per_chr": N_PER_CHR,
        },
    }
    print(json.dumps(out_json))


if __name__ == "__main__":
    main()
