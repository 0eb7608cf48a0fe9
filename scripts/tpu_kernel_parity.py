"""Per-kernel on-TPU parity drive for the Pallas fast paths.

Run after ANY edit to ops/pallas_kernels.py or ops/seeding.py (wired
into .claude/skills/verify): each TPU-gated kernel — dual-blur, level
stencil, fused classifier, pyramid classifier — is compiled on the real
chip at production shape and compared against its unfused XLA form,
with a per-kernel PASS/FAIL verdict (not one pooled median, VERDICT r4
weak-spot 5).  The CPU suite only ever runs these kernels under
``interpret=True``, so Mosaic compile/accuracy regressions are
invisible there (memory: y-widths not ≡ 0 mod 512 once failed compile
for weeks while the 2048-wide bench stayed green).

Usage:  python scripts/tpu_kernel_parity.py [--shape 60,2048,2048]
Exit code 0 iff every kernel passes.  ~3-4 min through the axon tunnel
(compiles dominate).
"""

import argparse
import sys
import time

import numpy as np


def _log(msg):
    print(f"[kparity +{time.perf_counter() - T0:6.1f}s] {msg}",
          flush=True)


T0 = time.perf_counter()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="60,2048,2048",
                    help="Z,X,Y production shape to drive")
    ap.add_argument("--th", type=float, default=300.0)
    ap.add_argument("--nlvl", type=int, default=10)
    args = ap.parse_args()
    shape = tuple(int(v) for v in args.shape.split(","))

    import jax
    import jax.numpy as jnp

    from imageanalysis3_tpu import synthetic as syn
    from imageanalysis3_tpu.ops import seeding
    from imageanalysis3_tpu.ops.filters import (gaussian_filter,
                                                maximum_filter,
                                                minimum_filter)
    from imageanalysis3_tpu.ops.pallas_kernels import (
        dual_gaussian_blur, fused_seed_classify,
        fused_seed_classify_pyramid, level_stencil_pallas)

    backend = jax.default_backend()
    _log(f"backend={backend} devices={jax.devices()}")
    if backend != "tpu":
        print("FAIL: not on TPU — this drive exists to catch "
              "Mosaic-only regressions; run it on the chip")
        return 1

    th, n_lvl, edge = args.th, args.nlvl, 2
    rng = np.random.default_rng(11)
    truth = syn.sample_spot_params(shape, 1500, rng, min_separation=6.0,
                                   height_range=(400.0, 3000.0))
    base = syn.render_spots_device(shape, truth["centers"],
                                   truth["heights"],
                                   background=truth["background"])
    im = jnp.asarray(syn.noisy_uint16_device(base, seed=3),
                     jnp.float32)
    jax.block_until_ready(im)
    del base
    _log(f"input stack {shape} rendered on device")

    results = {}

    def verdict(name, ok, detail):
        results[name] = bool(ok)
        _log(f"{'PASS' if ok else 'FAIL'}  {name}: {detail}")

    # ---- 1. dual_gaussian_blur vs XLA gaussian_filter ----------------
    t0 = time.perf_counter()
    fg, bg = dual_gaussian_blur(im, 0.75, 7.5)
    jax.block_until_ready((fg, bg))
    t_k = time.perf_counter() - t0
    fg_ref = gaussian_filter(im, 0.75)
    bg_ref = gaussian_filter(im, 7.5)
    jax.block_until_ready((fg_ref, bg_ref))
    d_fg = float(jnp.max(jnp.abs(fg - fg_ref)))
    d_bg = float(jnp.max(jnp.abs(bg - bg_ref)))
    verdict("dual_gaussian_blur", d_fg < 0.05 and d_bg < 0.05,
            f"max|Δfg|={d_fg:.2e} max|Δbg|={d_bg:.2e} "
            f"(compile+run {t_k:.1f}s)")

    # ---- 2. level_stencil_pallas vs unfused XLA stencil --------------
    t0 = time.perf_counter()
    lvl, diff, counts = level_stencil_pallas(fg_ref, bg_ref, th, n_lvl)
    jax.block_until_ready(lvl)
    t_k = time.perf_counter() - t0
    max_ft = maximum_filter(fg_ref, 3) == fg_ref
    min_ft = minimum_filter(bg_ref, 3) != bg_ref
    z, x, y = shape
    zi = jnp.arange(z)[:, None, None]
    xi = jnp.arange(x)[None, :, None]
    yi = jnp.arange(y)[None, None, :]
    edge_ok = ((zi >= edge) & (zi <= z - 1 - edge)
               & (xi >= edge) & (xi <= x - 1 - edge)
               & (yi >= edge) & (yi <= y - 1 - edge))
    qualify = max_ft & min_ft & edge_ok
    d_ref = fg_ref - bg_ref
    lvl_ref = jnp.clip(jnp.ceil((1 - d_ref / th) * n_lvl)
                       .astype(jnp.int32), 0, n_lvl)
    lvl_ref = jnp.where(qualify, lvl_ref, n_lvl)
    n_bad_lvl = int(jnp.sum(lvl != lvl_ref))
    d_diff = float(jnp.max(jnp.abs(diff - d_ref)))
    counts_ref = jnp.stack([jnp.sum((lvl_ref == k).astype(jnp.int32))
                            for k in range(n_lvl)])
    counts_ok = bool(jnp.all(counts == counts_ref))
    verdict("level_stencil", n_bad_lvl == 0 and d_diff < 1e-3
            and counts_ok,
            f"level mismatches={n_bad_lvl} max|Δdiff|={d_diff:.2e} "
            f"counts_ok={counts_ok} (compile+run {t_k:.1f}s)")
    del fg, bg, fg_ref, bg_ref, lvl, diff, lvl_ref, d_ref, qualify
    del max_ft, min_ft

    # ---- 3. fused_seed_classify vs unfused qualified-signal pass -----
    t0 = time.perf_counter()
    q_f, c_f = fused_seed_classify(im, 0.75, 7.5, th, n_lvl,
                                   min_edge_distance=edge)
    jax.block_until_ready(q_f)
    t_k = time.perf_counter() - t0
    q_r, c_r = seeding._level_diff_hist(im, th, 0, shape[1], shape,
                                        0.75, 7.5, 3, edge, n_lvl)
    jax.block_until_ready(q_r)
    fin_f = jnp.isfinite(q_f)
    fin_r = jnp.isfinite(q_r)
    frac_same = float(jnp.mean((fin_f == fin_r).astype(jnp.float32)))
    both = fin_f & fin_r
    d_q = float(jnp.max(jnp.where(both, jnp.abs(q_f - q_r), 0.0)))
    d_counts = int(abs(int(jnp.sum(c_f)) - int(jnp.sum(c_r))))
    verdict("fused_seed_classify",
            frac_same > 1 - 1e-5 and d_q < 0.05 and d_counts <= 4,
            f"qual agreement={frac_same:.7f} max|Δq|={d_q:.2e} "
            f"|Δtotal counts|={d_counts} (compile+run {t_k:.1f}s)")

    # ---- 4. pyramid classifier: same SELECTED seed set as exact ------
    t0 = time.perf_counter()
    q_p, c_p = fused_seed_classify_pyramid(im, 0.75, 7.5, th, n_lvl,
                                           min_edge_distance=edge)
    jax.block_until_ready(q_p)
    t_k = time.perf_counter() - t0
    sel_e = fin_f & (q_f >= th)
    sel_p = jnp.isfinite(q_p) & (q_p >= th)
    n_seldiff = int(jnp.sum(sel_e != sel_p))
    n_sel = int(jnp.sum(sel_e))
    rel = jnp.where(sel_e & sel_p,
                    jnp.abs(q_p - q_f) / jnp.maximum(q_f, 1e-6), 0.0)
    max_rel = float(jnp.max(rel))
    verdict("fused_seed_classify_pyramid",
            n_seldiff <= max(2, n_sel // 500) and max_rel < 0.02,
            f"selected-set diff={n_seldiff}/{n_sel} "
            f"max rel Δsignal={max_rel:.4f} (compile+run {t_k:.1f}s)")

    # ---- 5. fused LM kernel vs the vmapped XLA engine -----------------
    from imageanalysis3_tpu.ops import gaussian_fit as gf

    seeds = seeding.get_seeds(im, max_num_seeds=2048, th_seed=th,
                              pyramid_bg=True)
    coords = seeds.coords.astype(jnp.float32)
    t0 = time.perf_counter()
    r_p = gf.iter_fit_seed_points(im, coords, seeds.valid, lm_iters=8,
                                  n_max_iter=6, lm_backend="pallas")
    jax.block_until_ready(r_p.spots)
    t_k = time.perf_counter() - t0
    r_x = gf.iter_fit_seed_points(im, coords, seeds.valid, lm_iters=8,
                                  n_max_iter=6, lm_backend="xla")
    jax.block_until_ready(r_x.spots)
    valid_same = bool(jnp.all(r_p.valid == r_x.valid))
    both_v = r_p.valid & r_x.valid
    d_cen = float(jnp.max(jnp.where(
        both_v[:, None], jnp.abs(r_p.spots[:, 1:4] - r_x.spots[:, 1:4]),
        0.0)))
    d_h = float(jnp.max(jnp.where(
        both_v, jnp.abs(r_p.spots[:, 0] - r_x.spots[:, 0])
        / jnp.maximum(r_x.spots[:, 0], 1e-6), 0.0)))
    verdict("lm_fit_pallas",
            valid_same and d_cen < 5e-3 and d_h < 0.05,
            f"valid_same={valid_same} max|Δcenter|={d_cen:.2e}px "
            f"max relΔh={d_h:.2e} (compile+run {t_k:.1f}s)")

    ok = all(results.values())
    print(("ALL PASS" if ok else "FAILURES: "
           + ", ".join(k for k, v in results.items() if not v))
          + f"  ({len(results)} kernels, shape={shape})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
