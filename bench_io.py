"""Host .dax I/O benchmark: read + de-interleave overlapped with device
compute, at production FOV scale.

SURVEY §7 flags the host input path (0.6-1.6 GB/FOV .dax reads,
reference classes/batch_functions.py:60-302) as the likely north-star
gate, and the headline `bench.py` deliberately excludes it (device-only,
tunnel-frugal).  This benchmark measures that path at full scale:

  1. host: `.dax` file (200 frames x 2048^2 uint16, 1.6 GB = 60 z-planes
     x 3 interleaved channels + 2x10 buffer frames) -> `read_dax` ->
     `split_channels` (de-interleave all 3 channels), reading into a
     reused staging-buffer pool — the production input-pipeline pattern
     (pinned host staging for device upload), via read_dax(out=) /
     split_channels(out=);
  2. device: the same corrected+fitted per-round program `bench.py`
     times, on device-resident stacks;
  3. overlapped: the `ExperimentDriver` readahead pattern — a host
     thread reads FOV r+1 while the device processes FOV r.

On a production TPU host the upload between (1) and (2) rides PCIe at
>= 8 GB/s (~0.2 s/FOV, itself overlappable).  This environment reaches
the chip through a ~3-30 MB/s tunnel, so uploading 1.6 GB/FOV is a
tunnel artifact, not a property of the design: the overlapped loop
feeds the device from device-resident stacks (stated in the output),
and the tunnel's measured upload bandwidth + the extrapolated per-FOV
upload time are reported separately so the gap is explicit.

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
N_FOV = 2                         # distinct files on tmpfs
N_TIMED = 6                       # timed passes (alternating files)


def main():
    import jax
    import jax.numpy as jnp

    from imageanalysis3_tpu.config import (ExperimentConfig, SeedConfig,
                                           FitConfig, CorrectionConfig)
    from imageanalysis3_tpu.io.dax import (read_dax, split_channels,
                                           write_dax, read_inf)
    from imageanalysis3_tpu.io.native_loader import load_dax_channels
    from imageanalysis3_tpu.pipeline import FovPipeline
    from imageanalysis3_tpu import synthetic as syn

    n_frames = SHAPE[0] * N_CHANNELS + 2 * BUFFER_FRAMES
    frame_hw = SHAPE[1:]

    root = tempfile.mkdtemp(prefix="ia3_benchio_",
                            dir="/dev/shm" if os.path.isdir("/dev/shm")
                            else None)
    try:
        # ---- staging pool: pre-fault once (see module docstring)
        _note("pre-faulting staging buffers (slow on this VM, once)")
        movie_buf = np.empty((n_frames,) + frame_hw, np.uint16)
        movie_buf.fill(0)
        ch_bufs = [np.empty(SHAPE, np.uint16) for _ in CHANNELS]
        for b in ch_bufs:
            b.fill(0)
        _note("staging pool warm; synthesizing + writing FOV files")

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
        metas = [read_inf(p) for p in paths]
        fov_gb = os.path.getsize(paths[0]) / 1e9

        block = np.stack(ch_bufs)       # (C, Z, H, W) contiguous block

        def host_path(i: int) -> None:
            """Fused native read+de-interleave of FOV i into the block
            (io/native/daxload.cpp — the production input path; parallel
            pread of each frame straight into its channel slot)."""
            load_dax_channels(paths[i], CHANNELS, CHANNELS, n_z=SHAPE[0],
                              buffer_frames=BUFFER_FRAMES, meta=metas[i],
                              out=block)

        def host_path_numpy(i: int) -> None:
            """Two-pass NumPy reference path (read movie, slice)."""
            movie, _ = read_dax(paths[i], meta=metas[i], out=movie_buf)
            split_channels(movie, CHANNELS, CHANNELS, n_z=SHAPE[0],
                           buffer_frames=BUFFER_FRAMES, out=ch_bufs)

        _note("host path warmup")
        host_path(0)
        host_path_numpy(0)
        t_host, t_host_np = [], []
        for k in range(N_TIMED):
            t0 = time.perf_counter()
            host_path(k % N_FOV)
            t_host.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            host_path_numpy(k % N_FOV)
            t_host_np.append(time.perf_counter() - t0)
        t_host_med = float(np.median(t_host))
        t_host_np_med = float(np.median(t_host_np))
        _note(f"host read+deint: native {t_host_med:.3f} s/FOV "
              f"({fov_gb / t_host_med:.2f} GB/s), numpy "
              f"{t_host_np_med:.3f} s/FOV; building pipeline")

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

        _note("timing device-only path")
        variants = [device_stack(10 + k) for k in range(N_FOV)]
        jax.block_until_ready(variants)
        t_dev = []
        for k in range(N_TIMED):
            t0 = time.perf_counter()
            jax.block_until_ready(
                pipe.process_round(variants[k % N_FOV][None], ref_im))
            t_dev.append(time.perf_counter() - t0)
        t_dev_med = float(np.median(t_dev))
        _note(f"device: {t_dev_med:.3f} s/stack; timing overlapped path")

        # ---- overlapped: host thread reads FOV r+1 during device FOV r
        # (device consumes device-resident stacks — see module docstring;
        # upload is measured separately below)
        th = None
        t0 = time.perf_counter()
        for k in range(N_TIMED):
            res = pipe.process_round(variants[k % N_FOV][None],
                                     ref_im)                # async dispatch
            if th is not None:
                th.join()
            th = threading.Thread(target=host_path, args=(k % N_FOV,))
            th.start()
            jax.block_until_ready(res)
        th.join()
        t_overlap = (time.perf_counter() - t0) / N_TIMED
        bound = max(t_host_med, t_dev_med)
        efficiency = bound / t_overlap if t_overlap > 0 else float("nan")

        _note("measuring tunnel upload bandwidth")
        # ---- tunnel upload bandwidth (warm 128 MB slice of the pool)
        probe = movie_buf[:32, :, :1024]
        t0 = time.perf_counter()
        jax.block_until_ready(jnp.asarray(np.ascontiguousarray(probe)))
        t_up = time.perf_counter() - t0
        up_mbps = probe.nbytes / 1e6 / t_up
        upload_s_per_fov_tunnel = fov_gb * 1e3 / up_mbps

        out = {
            "metric": "host .dax read+deinterleave overlapped with "
                      "device compute, 2048^2x60x3ch FOVs",
            "value": round(1.0 / t_overlap, 4),
            "unit": "stacks/s/chip (with host I/O)",
            "vs_baseline": round((1.0 / t_overlap) / (20.0 / 8.0), 4),
            "extra": {
                "fov_gb": round(fov_gb, 3),
                "host_read_deint_s": round(t_host_med, 4),
                "host_read_deint_numpy_s": round(t_host_np_med, 4),
                "host_read_deint_gbps": round(fov_gb / t_host_med, 2),
                "device_s_per_stack": round(t_dev_med, 4),
                "overlapped_s_per_stack": round(t_overlap, 4),
                "overlap_efficiency": round(efficiency, 3),
                "bound_stage": "host_io" if t_host_med > t_dev_med
                               else "device",
                "tunnel_upload_mbps": round(up_mbps, 1),
                "tunnel_upload_s_per_fov_extrapolated":
                    round(upload_s_per_fov_tunnel, 1),
                "upload_note": "overlapped loop feeds device-resident "
                               "stacks; production PCIe upload "
                               "(>=8 GB/s, ~0.2 s/FOV) overlaps the "
                               "same way, this tunnel does not",
                "n_fov_files": N_FOV,
                "n_timed_passes": N_TIMED,
                "device": str(jax.devices()[0]),
            },
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
