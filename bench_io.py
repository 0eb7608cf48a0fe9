"""Host .dax I/O benchmark: read (+ de-interleave) overlapped with device
compute, at production FOV scale, in BOTH input modes.

SURVEY §7 flags the host input path (0.6-1.6 GB/FOV .dax reads,
reference classes/batch_functions.py:60-302) as the likely north-star
gate, and the headline `bench.py` deliberately excludes it (device-only,
tunnel-frugal).  This benchmark measures that path at full scale:

  host input modes
  1. fused native loader (io/native/daxload.cpp): parallel pread of each
     (channel, z) frame straight into its channel slot — host does the
     de-interleave;
  2. NumPy two-pass reference (read movie, slice);
  3. raw-pread mode (io.dax.read_raw_window): ONE sequential read of the
     contiguous frame window the round needs (buffer frames skipped);
     de-interleave happens ON DEVICE as strided slices fused into the
     round program (ops.corrections.deinterleave_stack).  Host work is
     structurally a raw read — independent of host core count, which is
     the round-5 fix for the 1-vCPU overlap ceiling measured in r4.

  device: the same corrected+fitted per-round program `bench.py` times,
  on device-resident stacks (mode 3 adds the on-device de-interleave);

  overlapped: the `ExperimentDriver` readahead pattern — a host thread
  reads FOV r+1 while the device processes FOV r — measured for modes
  1 and 3.

Honesty additions (round-5, VERDICT items 1/7):
  * N_FOV = 8 distinct files; every loop cycles through all 8, so no
    2-file page-cache artifact;
  * a genuine COLD read: two files written to the disk-backed
    filesystem, page cache dropped (/proc/sys/vm/drop_caches), then
    read once — reported separately (tmpfs rows are warm by
    construction: tmpfs IS memory; production assumes warm prefetch
    from network storage into host RAM).

On a production TPU host the upload between host read and device
compute rides PCIe at >= 8 GB/s (~0.2 s/FOV, itself overlappable).
This environment reaches the chip through a ~3-30 MB/s tunnel, so
uploading 1.5 GB/FOV is a tunnel artifact, not a property of the
design: the overlapped loops feed the device from device-resident
stacks (stated in the output), and the tunnel's measured upload
bandwidth + the extrapolated per-FOV upload time are reported
separately so the gap is explicit.

This VM also lazily sources guest memory from a remote snapshot at
~5 MB/s on FIRST touch (warm pages run at ~8 GB/s), so the setup phase
pre-faults every buffer and tmpfs page once, off the clock; the timed
loops then reuse them.  That is exactly what the staging-pool design
does in production anyway.

Prints ONE JSON line like bench.py; run directly: `python bench_io.py`.
"""

import json
import os
import shutil
import sys
import tempfile
import threading
import time

import numpy as np


def _note(msg: str) -> None:
    print(f"[bench_io +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.perf_counter()

SHAPE = (60, 2048, 2048)          # (Z, X, Y) per channel
N_CHANNELS = 3
BUFFER_FRAMES = 10
CHANNELS = ["750", "647", "561"]
N_FOV = 8                         # distinct files on tmpfs (no 2-file
                                  # page-cache artifact; VERDICT r4 item 7)
N_TIMED = 8                       # timed passes (one per file)
N_COLD = 2                        # disk-backed files for the cold read


def main():
    import jax
    import jax.numpy as jnp

    from imageanalysis3_tpu.config import (ExperimentConfig, SeedConfig,
                                           FitConfig, CorrectionConfig)
    from imageanalysis3_tpu.io.dax import (read_dax, split_channels,
                                           write_dax, read_inf,
                                           raw_frame_window,
                                           read_raw_window)
    from imageanalysis3_tpu.io.native_loader import load_dax_channels
    from imageanalysis3_tpu.pipeline import FovPipeline
    from imageanalysis3_tpu import synthetic as syn

    n_frames = SHAPE[0] * N_CHANNELS + 2 * BUFFER_FRAMES
    frame_hw = SHAPE[1:]

    root = tempfile.mkdtemp(prefix="ia3_benchio_",
                            dir="/dev/shm" if os.path.isdir("/dev/shm")
                            else None)
    cold_root = None
    try:
        # ---- staging pool: pre-fault once (see module docstring)
        _note("pre-faulting staging buffers (slow on this VM, once)")
        movie_buf = np.empty((n_frames,) + frame_hw, np.uint16)
        movie_buf.fill(0)
        ch_bufs = [np.empty(SHAPE, np.uint16) for _ in CHANNELS]
        for b in ch_bufs:
            b.fill(0)
        window = raw_frame_window(CHANNELS, CHANNELS, n_z=SHAPE[0],
                                  buffer_frames=BUFFER_FRAMES)
        raw_buf = np.empty((window.n_frames,) + frame_hw, np.uint16)
        raw_buf.fill(0)
        _note(f"staging pool warm ({window.n_frames}-frame raw window); "
              f"synthesizing + writing {N_FOV} FOV files")

        # content is irrelevant to I/O timing: tile a small random block
        # through the warm movie buffer, vary per FOV by a cheap offset
        tile = np.frombuffer(os.urandom(4 * frame_hw[0] * frame_hw[1] * 2),
                             np.uint16).reshape((4,) + frame_hw)
        tile = (tile % 3920 + 80).astype(np.uint16)
        reps = -(-n_frames // 4)
        paths = []
        for k in range(N_FOV):
            np.copyto(movie_buf,
                      np.broadcast_to(tile, (reps, 4) + frame_hw)
                      .reshape(-1, *frame_hw)[:n_frames])
            movie_buf += np.uint16(k)
            p = os.path.join(root, f"Conv_zscan_{k:02d}.dax")
            write_dax(p, movie_buf)
            paths.append(p)
            if k == 0:
                _note(f"wrote file 0 of {N_FOV}")
        metas = [read_inf(p) for p in paths]
        fov_gb = os.path.getsize(paths[0]) / 1e9
        raw_gb = raw_buf.nbytes / 1e9

        block = np.stack(ch_bufs)       # (C, Z, H, W) contiguous block

        def host_path(i: int) -> None:
            """Fused native read+de-interleave of FOV i into the block
            (io/native/daxload.cpp — parallel pread of each frame
            straight into its channel slot)."""
            load_dax_channels(paths[i], CHANNELS, CHANNELS, n_z=SHAPE[0],
                              buffer_frames=BUFFER_FRAMES, meta=metas[i],
                              out=block)

        def host_path_numpy(i: int) -> None:
            """Two-pass NumPy reference path (read movie, slice)."""
            movie, _ = read_dax(paths[i], meta=metas[i], out=movie_buf)
            split_channels(movie, CHANNELS, CHANNELS, n_z=SHAPE[0],
                           buffer_frames=BUFFER_FRAMES, out=ch_bufs)

        def host_path_pread(i: int) -> None:
            """Raw-pread mode host half: ONE sequential read of the
            frame window; no de-interleave (that runs on device)."""
            read_raw_window(paths[i], window, meta=metas[i], out=raw_buf)

        _note("host path warmup")
        host_path(0)
        host_path_numpy(0)
        host_path_pread(0)
        t_host, t_host_np, t_pread = [], [], []
        for k in range(N_TIMED):
            t0 = time.perf_counter()
            host_path(k % N_FOV)
            t_host.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            host_path_numpy(k % N_FOV)
            t_host_np.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            host_path_pread(k % N_FOV)
            t_pread.append(time.perf_counter() - t0)
        t_host_med = float(np.median(t_host))
        t_host_np_med = float(np.median(t_host_np))
        t_pread_med = float(np.median(t_pread))
        _note(f"host read+deint: native {t_host_med:.3f} s/FOV "
              f"({fov_gb / t_host_med:.2f} GB/s; max over {N_FOV} files "
              f"{max(t_host):.3f}), numpy {t_host_np_med:.3f} s/FOV; "
              f"raw pread {t_pread_med:.3f} s/FOV "
              f"({raw_gb / t_pread_med:.2f} GB/s, max {max(t_pread):.3f}); "
              "building pipeline")

        # ---- device compute (bench.py's per-round program, 1 channel)
        cfg = ExperimentConfig(
            image_size=SHAPE,
            correction=CorrectionConfig(),
            seed=SeedConfig(th_seed=300.0, max_num_seeds=2048,
                            cand_capacity=16384),
            fit=FitConfig(),
        )
        prof = jnp.asarray(syn.illumination_profile(SHAPE[1:]),
                           jnp.float32)
        pipe = FovPipeline(cfg, n_channels=1, drift_channel_index=0,
                           fit_channel_indices=(0,),
                           illumination=np.asarray(prof)[None],
                           image_shape=SHAPE)
        rng = np.random.default_rng(1)
        truth = syn.sample_spot_params(SHAPE, 1800, rng,
                                       min_separation=6.0)

        def device_stack(seed):
            return syn.noisy_uint16_device(
                syn.render_spots_device(SHAPE, truth["centers"],
                                        truth["heights"],
                                        background=truth["background"]),
                seed=seed, illumination=prof)

        _note("rendering reference + compiling process_round")
        ref_im = pipe.prepare_reference(
            pipe.correct_reference(device_stack(0)[None]))
        jax.block_until_ready(pipe.process_round(device_stack(99)[None],
                                                 ref_im))

        # raw-mode device variants: the round's raw interleaved frame
        # window resident on device; the program slices its channel out
        # (rel_start 0, stride N_CHANNELS) before the correction pass
        raw_starts = (0,)

        @jax.jit
        def make_raw(stack):
            raw = jnp.zeros((window.n_frames,) + frame_hw, jnp.uint16)
            return raw.at[0::N_CHANNELS].set(stack)

        def device_raw(seed):
            return make_raw(device_stack(seed))

        _note("compiling raw-mode (device-deinterleave) program")
        jax.block_until_ready(pipe.process_round_raw(
            device_raw(98), ref_im, raw_starts, N_CHANNELS,
            donate=False))

        _note("timing device-only paths")
        # two resident variants per mode bound HBM while exercising
        # distinct inputs (raw window = 1.4 GB device-resident each)
        n_var = 2
        variants = [device_stack(10 + k) for k in range(n_var)]
        jax.block_until_ready(variants)
        t_dev = []
        for k in range(N_TIMED):
            t0 = time.perf_counter()
            jax.block_until_ready(
                pipe.process_round(variants[k % n_var][None], ref_im))
            t_dev.append(time.perf_counter() - t0)
        t_dev_med = float(np.median(t_dev))

        raw_variants = [device_raw(10 + k) for k in range(n_var)]
        jax.block_until_ready(raw_variants)
        t_dev_raw = []
        for k in range(N_TIMED):
            t0 = time.perf_counter()
            jax.block_until_ready(pipe.process_round_raw(
                raw_variants[k % n_var], ref_im, raw_starts, N_CHANNELS,
                donate=False))
            t_dev_raw.append(time.perf_counter() - t0)
        t_dev_raw_med = float(np.median(t_dev_raw))
        _note(f"device: {t_dev_med:.3f} s/stack (fused-host mode), "
              f"{t_dev_raw_med:.3f} s/stack (raw mode incl. on-device "
              "de-interleave); timing overlapped paths")

        # ---- overlapped: host thread reads FOV r+1 during device FOV r
        # (device consumes device-resident stacks — see module docstring;
        # upload is measured separately below)
        def overlapped(dispatch, host_fn):
            th = None
            t0 = time.perf_counter()
            for k in range(N_TIMED):
                res = dispatch(k)               # async dispatch
                if th is not None:
                    th.join()
                th = threading.Thread(target=host_fn, args=(k % N_FOV,))
                th.start()
                jax.block_until_ready(res)
            th.join()
            return (time.perf_counter() - t0) / N_TIMED

        t_overlap = overlapped(
            lambda k: pipe.process_round(variants[k % n_var][None],
                                         ref_im),
            host_path)
        eff_fused = max(t_host_med, t_dev_med) / t_overlap

        # raw mode reuses persistent device variants (donate=False —
        # production donates each fresh upload instead; same program body)
        t_overlap_raw = overlapped(
            lambda k: pipe.process_round_raw(
                raw_variants[k % n_var], ref_im, raw_starts, N_CHANNELS,
                donate=False),
            host_path_pread)
        eff_raw = max(t_pread_med, t_dev_raw_med) / t_overlap_raw
        _note(f"overlap: fused {t_overlap:.3f} s/stack (eff "
              f"{eff_fused:.2f}), raw-pread {t_overlap_raw:.3f} s/stack "
              f"(eff {eff_raw:.2f}); measuring tunnel upload bandwidth")

        # ---- tunnel upload bandwidth (warm 128 MB slice of the pool)
        probe = movie_buf[:32, :, :1024]
        t0 = time.perf_counter()
        jax.block_until_ready(jnp.asarray(np.ascontiguousarray(probe)))
        t_up = time.perf_counter() - t0
        up_mbps = probe.nbytes / 1e6 / t_up
        upload_s_per_fov_tunnel = raw_gb * 1e3 / up_mbps

        # ---- genuine COLD read from the disk-backed filesystem (last:
        # dropping the page cache slows every later first file touch)
        cold = {}
        try:
            cold_root = tempfile.mkdtemp(prefix="ia3_benchio_cold_",
                                         dir=os.path.expanduser("~"))
            _note(f"cold-read test: writing {N_COLD} files to disk "
                  f"({cold_root})")
            cold_paths = []
            for k in range(N_COLD):
                p = os.path.join(cold_root, f"cold_{k:02d}.dax")
                shutil.copyfile(paths[k], p)
                shutil.copyfile(paths[k][:-4] + ".inf", p[:-4] + ".inf")
                cold_paths.append(p)
            os.sync()
            with open("/proc/sys/vm/drop_caches", "w") as fh:
                fh.write("3\n")
            _note("page cache dropped; timing cold preads")
            t_cold = []
            for k in range(N_COLD):
                t0 = time.perf_counter()
                read_raw_window(cold_paths[k], window, out=raw_buf)
                t_cold.append(time.perf_counter() - t0)
            # warm re-read of the same files for the delta
            t_rewarm = []
            for k in range(N_COLD):
                t0 = time.perf_counter()
                read_raw_window(cold_paths[k], window, out=raw_buf)
                t_rewarm.append(time.perf_counter() - t0)
            cold = {
                "cold_disk_pread_s_per_fov": round(float(np.median(t_cold)), 4),
                "cold_disk_pread_gbps": round(
                    raw_gb / float(np.median(t_cold)), 2),
                "warm_disk_pread_s_per_fov": round(
                    float(np.median(t_rewarm)), 4),
                "cold_note": "page cache dropped via drop_caches; disk-"
                             "backed fs; tmpfs rows above are warm by "
                             "construction (tmpfs IS memory — production "
                             "assumes warm prefetch into host RAM)",
            }
            _note(f"cold pread {cold['cold_disk_pread_s_per_fov']} s/FOV "
                  f"({cold['cold_disk_pread_gbps']} GB/s)")
        except (OSError, PermissionError) as e:
            cold = {"cold_note": f"cold test unavailable: {e}"}

        best = min(t_overlap, t_overlap_raw)
        out = {
            "metric": "host .dax read(+deinterleave) overlapped with "
                      "device compute, 2048^2x60x3ch FOVs, best input "
                      "mode (raw-pread + on-device deinterleave vs "
                      "fused host loader)",
            "value": round(1.0 / best, 4),
            "unit": "stacks/s/chip (with host I/O)",
            "vs_baseline": round((1.0 / best) / (20.0 / 8.0), 4),
            "extra": {
                "fov_gb": round(fov_gb, 3),
                "raw_window_gb": round(raw_gb, 3),
                "host_read_deint_s": round(t_host_med, 4),
                "host_read_deint_numpy_s": round(t_host_np_med, 4),
                "host_read_deint_gbps": round(fov_gb / t_host_med, 2),
                "host_raw_pread_s": round(t_pread_med, 4),
                "host_raw_pread_gbps": round(raw_gb / t_pread_med, 2),
                "host_raw_pread_max_s": round(float(max(t_pread)), 4),
                "device_s_per_stack": round(t_dev_med, 4),
                "device_raw_mode_s_per_stack": round(t_dev_raw_med, 4),
                "overlapped_s_per_stack_fused": round(t_overlap, 4),
                "overlap_efficiency_fused": round(eff_fused, 3),
                "overlapped_s_per_stack_rawpread": round(t_overlap_raw, 4),
                "overlap_efficiency_rawpread": round(eff_raw, 3),
                "bound_stage_rawpread":
                    "host_io" if t_pread_med > t_dev_raw_med else "device",
                "tunnel_upload_mbps": round(up_mbps, 1),
                "tunnel_upload_s_per_fov_extrapolated":
                    round(upload_s_per_fov_tunnel, 1),
                "upload_note": "overlapped loops feed device-resident "
                               "stacks; production PCIe upload "
                               "(>=8 GB/s, ~0.2 s/FOV) overlaps the "
                               "same way, this tunnel does not",
                "n_fov_files": N_FOV,
                "n_timed_passes": N_TIMED,
                "device": str(jax.devices()[0]),
                **cold,
            },
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        if cold_root:
            shutil.rmtree(cold_root, ignore_errors=True)


if __name__ == "__main__":
    main()
