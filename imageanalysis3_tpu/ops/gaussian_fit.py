"""Constrained 3D Gaussian spot fitting: batched Levenberg-Marquardt on TPU.

Behavior target: reference External/Fitting_v4.py:165-683 —
  * the 10-parameter constrained model (GaussianFit.calc_f :259-290):
    log background, log height, sigmoid-boxed center within +-delta of the
    seed, sigmoid-boxed squared widths in [min_w^2, max_w^2], and two
    sine-angles giving a full-covariance rotated anisotropic Gaussian;
  * natural parameter row [h, z, x, y, bk, wz, wx, wy, sin_t, sin_p, eps]
    (to_natural_paramaters :244-258, the 11-column spot format of
    classes/preprocess.py:13);
  * iterative fit-and-subtract (iter_fit_seed_points :559-683): first fit
    each seed on pixels it owns (nearest-seed Voronoi within a radius-r
    ball), then repeatedly re-fit each spot against the image with all
    *other* reconstructions subtracted until centers move < 0.1 px.

TPU-first design: the reference runs MINPACK leastsq once per spot in a
Python loop with sequential in-place image subtraction.  Here every spot is
fit concurrently: pixels are gathered into fixed (2r)^3 blocks with
ball/bounds/ownership masks, the LM loop is a fixed-iteration `lax.fori`
vmapped over spots (J^T J is a 10x10 solve — tiny batched matmuls), and the
sequential subtract-refit becomes block-synchronous (Jacobi) rounds: each
round every spot is refit against the raw image minus its neighbors'
current reconstructions.  Both schemes share the fixpoint "every spot fits
the image minus the others"; only the iteration order differs.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .seeding import Seeds, get_seeds

_HIGH = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Model: constrained parametrization (reference Fitting_v4.py:189-290)
# dims follow our zxy convention; the reference's (x,y,z) names map to
# (z,x,y) here because it feeds X=[z,x,y] into GaussianFit (iter_fit :614).
# ---------------------------------------------------------------------------


def _to_center(cp, center_est, delta):
    # 2d/(1+e^x) - d  ==  d * tanh(-x/2), numerically stable
    return center_est + delta * jnp.tanh(-cp / 2.0)


def _to_ws(wp, min_ws, max_ws):
    # (max-min)/(1+e^w) + min  ==  min + (max-min)*sigmoid(-w)
    return min_ws + (max_ws - min_ws) * jax.nn.sigmoid(-wp)


def _to_sine(tp):
    return jnp.tanh(-tp / 2.0)


def _quadform_coeffs(t, p, s1, s2, s3):
    """Coefficients of the rotated precision quadratic form
    (reference calc_f :268-283).  s_i = 1/width_i^2."""
    p2, t2 = p * p, t * t
    tc2, pc2 = 1 - t2, 1 - p2
    tc = jnp.sqrt(jnp.maximum(tc2, 0.0))
    pc = jnp.sqrt(jnp.maximum(pc2, 0.0))
    a11 = pc2 * tc2 * s1 + t2 * s2 + p2 * tc2 * s3
    a22 = pc2 * t2 * s1 + tc2 * s2 + p2 * t2 * s3
    a33 = p2 * s1 + pc2 * s3
    a12 = 2 * tc * t * (pc2 * s1 - s2 + p2 * s3)
    a13 = 2 * p * pc * tc * (s3 - s1)
    a23 = 2 * p * pc * t * (s3 - s1)
    return a11, a22, a33, a12, a13, a23


def gaussian_model(params: jnp.ndarray, coords: jnp.ndarray,
                   center_est: jnp.ndarray, delta: float,
                   min_w: float, max_w: float,
                   include_background: bool = True) -> jnp.ndarray:
    """Model intensity at `coords` (P, 3) for constrained `params` (10,).

    params = [bk, h, c1p, c2p, c3p, w1p, w2p, w3p, pp, tp] (reference
    GaussianFit.p_ ordering, :185).
    """
    bk, h = params[0], params[1]
    c = _to_center(params[2:5], center_est, delta)
    ws = _to_ws(params[5:8], min_w * min_w, max_w * max_w)
    p = _to_sine(params[8])
    t = _to_sine(params[9])
    s1, s2, s3 = 1.0 / ws[0], 1.0 / ws[1], 1.0 / ws[2]
    a11, a22, a33, a12, a13, a23 = _quadform_coeffs(t, p, s1, s2, s3)
    d = coords - c[None]
    q = (a11 * d[:, 0] ** 2 + a22 * d[:, 1] ** 2 + a33 * d[:, 2] ** 2
         + a12 * d[:, 0] * d[:, 1] + a13 * d[:, 0] * d[:, 2]
         + a23 * d[:, 1] * d[:, 2])
    peak = jnp.exp(h - 0.5 * q)
    if include_background:
        return jnp.exp(jnp.clip(bk, -70.0, 70.0)) + peak
    return peak


def to_natural(params: jnp.ndarray, center_est: jnp.ndarray, delta: float,
               min_w: float, max_w: float, eps: jnp.ndarray) -> jnp.ndarray:
    """Constrained params -> [h, z, x, y, bk, wz, wx, wy, sin_t, sin_p, eps]
    (reference to_natural_paramaters :244-258)."""
    h = jnp.exp(params[1])
    bk = jnp.exp(jnp.clip(params[0], -70.0, 70.0))
    c = _to_center(params[2:5], center_est, delta)
    ws = jnp.sqrt(_to_ws(params[5:8], min_w * min_w, max_w * max_w))
    p = _to_sine(params[8])
    t = _to_sine(params[9])
    return jnp.concatenate([jnp.stack([h, c[0], c[1], c[2], bk,
                                       ws[0], ws[1], ws[2], t, p]),
                            eps[None]])


def init_params(pixels: jnp.ndarray, mask: jnp.ndarray,
                min_w: float, max_w: float, init_w: float,
                n_aprox: int = 10,
                coords: Optional[jnp.ndarray] = None,
                center_est: Optional[jnp.ndarray] = None,
                delta: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Initial constrained params from pixel statistics (reference
    GaussianFit.__init__ :174-186).

    With `coords`/`center_est`/`delta`, the center starts at the
    intensity-weighted centroid of the background-subtracted block
    (reference gfit_fast :433-490 moments) expressed in the sigmoid box
    — measured on the bench scene this moves the LM start within
    ~0.1 px of the optimum, which is what lets lm_iters=8 keep the full
    accuracy margin the lm_iters=12 zero-offset start needed (r5 fit
    budget cut, BASELINE.md fit row)."""
    big = jnp.where(mask, pixels, jnp.inf)
    small = jnp.where(mask, pixels, -jnp.inf)
    lo = -jax.lax.top_k(-big, n_aprox)[0]
    hi = jax.lax.top_k(small, n_aprox)[0]
    n_valid = jnp.sum(mask.astype(jnp.int32))
    k = jnp.minimum(n_aprox, jnp.maximum(n_valid, 1))
    lo_mean = jnp.sum(jnp.where(jnp.isfinite(lo), lo, 0.0)) / k
    hi_mean = jnp.sum(jnp.where(jnp.isfinite(hi), hi, 0.0)) / k
    eps0 = jnp.exp(-10.0)
    bk = jnp.log(jnp.maximum(lo_mean, eps0))
    h = jnp.log(jnp.maximum(hi_mean, eps0))
    wsq = init_w * init_w
    wg = jnp.log((max_w * max_w - wsq) / (wsq - min_w * min_w))
    cp = jnp.zeros(3, pixels.dtype)
    if coords is not None:
        w = jnp.maximum(pixels - lo_mean, 0.0) * mask.astype(jnp.float32)
        wsum = jnp.sum(w)
        c0 = jnp.sum(coords * w[:, None], axis=0) \
            / jnp.maximum(wsum, 1e-12)
        u = jnp.clip((c0 - center_est) / delta, -0.9, 0.9)
        cp = jnp.where(wsum > 1e-6, -2.0 * jnp.arctanh(u), 0.0)
    return jnp.concatenate([jnp.stack([bk, h]), cp,
                            jnp.stack([wg, wg, wg, 0.0, 0.0])])


# ---------------------------------------------------------------------------
# Levenberg-Marquardt (vmapped; replaces MINPACK leastsq, :377-393)
# ---------------------------------------------------------------------------


def _cg_solve_spd(a: jnp.ndarray, b: jnp.ndarray,
                  iters: int = 12) -> jnp.ndarray:
    """Solve SPD `a @ x = b` by unrolled conjugate gradient.

    For the (10, 10) damped normal equations, 12 CG steps reproduce the
    LU solution to ~1e-5 while running entirely on the VPU — measured 3x
    faster than batched `jnp.linalg.solve` on TPU (whose tiny-batch LU
    pivoting serializes badly).
    """
    x = jnp.zeros_like(b)
    r = b
    p = r
    rs = jnp.dot(r, r)
    for _ in range(iters):
        ap = a @ p
        alpha = rs / jnp.maximum(jnp.dot(p, ap), 1e-20)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.dot(r, r)
        p = r + (rs_new / jnp.maximum(rs, 1e-20)) * p
        rs = rs_new
    return x


def _scalar_geometry(params: jnp.ndarray, center_est: jnp.ndarray,
                     delta: float, min_w: float, max_w: float):
    """Per-spot scalar geometry: quadform coefficients + center.

    Pure function of the 10 constrained params (bk/h unused), O(1) work —
    its 9x10 jacfwd Jacobian is what makes the analytic LM Jacobian cheap:
    all pixel-dependence of dq/dtheta factors through 9 per-pixel basis
    features (see `_jt_analytic`)."""
    c = _to_center(params[2:5], center_est, delta)
    ws = _to_ws(params[5:8], min_w * min_w, max_w * max_w)
    p = _to_sine(params[8])
    t = _to_sine(params[9])
    a11, a22, a33, a12, a13, a23 = _quadform_coeffs(
        t, p, 1.0 / ws[0], 1.0 / ws[1], 1.0 / ws[2])
    return jnp.stack([a11, a22, a33, a12, a13, a23]), c


def _jt_analytic(params: jnp.ndarray, pixels: jnp.ndarray,
                 coords: jnp.ndarray, maskf: jnp.ndarray,
                 center_est: jnp.ndarray, delta: float,
                 min_w: float, max_w: float):
    """Closed-form (J^T, residual) of the masked residual at `params`.

    Identical values to `jax.linearize` + 10 basis JVPs (parity-tested in
    tests/test_fit.py), ~2x cheaper per LM iteration: q = d^T M d is
    linear in the 6 quadform coefficients and quadratic in d, so for every
    parameter theta,

        dq/dtheta = GA[:,theta] . basis6(d)  -  (2 M Gc[:,theta]) . d

    where (GA, Gc) is the 9x10 jacfwd of the per-spot scalar geometry.
    The per-pixel work is one (10, 9) x (9, P) matmul on shared features
    [d, basis6] instead of 10 tangent propagations through the model chain.
    """
    bk, h = params[0], params[1]
    geom = lambda q: _scalar_geometry(q, center_est, delta, min_w, max_w)
    A6, c = geom(params)
    GA, Gc = jax.jacfwd(geom)(params)                 # (6, 10), (3, 10)
    d = coords - c[None]                              # (P, 3)
    basis6 = jnp.stack([d[:, 0] * d[:, 0], d[:, 1] * d[:, 1],
                        d[:, 2] * d[:, 2], d[:, 0] * d[:, 1],
                        d[:, 0] * d[:, 2], d[:, 1] * d[:, 2]])  # (6, P)
    q = jnp.einsum("i,ip->p", A6, basis6, precision=_HIGH)
    peak = jnp.exp(h - 0.5 * q)
    bkc = jnp.clip(bk, -70.0, 70.0)
    r = (jnp.exp(bkc) + peak - pixels) * maskf
    # symmetric M with q = d^T M d: diag [a11,a22,a33], off-diag a../2
    Mm = A6[jnp.array([[0, 3, 4], [3, 1, 5], [4, 5, 2]])] \
        * jnp.array([[1.0, 0.5, 0.5], [0.5, 1.0, 0.5], [0.5, 0.5, 1.0]])
    Cd = -2.0 * (Mm @ Gc)                             # (3, 10)
    dq = GA.T @ basis6 + Cd.T @ d.T                   # (10, P)
    Jt = (-0.5 * peak)[None] * dq
    Jt = Jt.at[1].add(peak)
    dbk = jnp.where((bk >= -70.0) & (bk <= 70.0), jnp.exp(bkc), 0.0)
    Jt = Jt.at[0].add(dbk)
    return Jt * maskf[None], r


def _batched_lm(pixels: jnp.ndarray, coords: jnp.ndarray,
                mask: jnp.ndarray, centers: jnp.ndarray,
                delta_vec: jnp.ndarray, min_w: float, max_w: float,
                init_w: float, lm_iters: int,
                params0: Optional[jnp.ndarray],
                analytic_jac: bool, backend: str
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batch-fit N gathered blocks -> (params (N, 10), eps (N,)).

    backend "xla": the vmapped `lm_fit_single` engine.  "pallas" /
    "pallas_interpret": the fused VMEM-resident kernel (ops/pallas_lm.py)
    — same model, same CG solve, one kernel for all `lm_iters`
    iterations instead of per-iteration HBM round-trips."""
    if backend in ("pallas", "pallas_interpret"):
        if params0 is None:
            params0 = jax.vmap(
                lambda px, mk, co, ce, dl: init_params(
                    px, mk, min_w, max_w, init_w, coords=co,
                    center_est=ce, delta=dl))(
                pixels, mask, coords, centers, delta_vec)
        from .pallas_lm import lm_fit_pallas

        return lm_fit_pallas(pixels, coords, mask, centers, delta_vec,
                             params0, min_w, max_w, lm_iters=lm_iters,
                             interpret=(backend == "pallas_interpret"))
    if params0 is None:
        fit = jax.vmap(lambda px, co, mk, ce, dl: lm_fit_single(
            px, co, mk, ce, dl, min_w, max_w, init_w, lm_iters,
            analytic_jac=analytic_jac))
        return fit(pixels, coords, mask, centers, delta_vec)
    fit = jax.vmap(lambda px, co, mk, ce, dl, p0: lm_fit_single(
        px, co, mk, ce, dl, min_w, max_w, init_w, lm_iters,
        params0=p0, analytic_jac=analytic_jac))
    return fit(pixels, coords, mask, centers, delta_vec, params0)


def rebase_center_params(params: jnp.ndarray, center_est: jnp.ndarray,
                         old_delta: float, new_delta: float) -> jnp.ndarray:
    """Re-express the sigmoid-boxed center under a different delta box so a
    previous round's solution can warm-start the next round."""
    c = _to_center(params[2:5], center_est, old_delta)
    u = jnp.clip((c - center_est) / new_delta, -1 + 1e-6, 1 - 1e-6)
    cp = -2.0 * jnp.arctanh(u)
    return params.at[2:5].set(cp)


def lm_fit_single(pixels: jnp.ndarray, coords: jnp.ndarray,
                  mask: jnp.ndarray, center_est: jnp.ndarray,
                  delta: float, min_w: float, max_w: float, init_w: float,
                  lm_iters: int = 30,
                  params0: Optional[jnp.ndarray] = None,
                  analytic_jac: bool = True
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fit one spot's pixel block -> (constrained params, mean |residual|)."""
    if params0 is None:
        params0 = init_params(pixels, mask, min_w, max_w, init_w,
                              coords=coords, center_est=center_est,
                              delta=delta)
    maskf = mask.astype(jnp.float32)

    def residual(p):
        f = gaussian_model(p, coords, center_est, delta, min_w, max_w)
        return (f - pixels) * maskf

    def step(i, state):
        params, lam, cost = state
        # J^T laid out (10, P): the long pixel axis stays minor, so the
        # vmapped batch is (N, 10, P) — lanes hold pixels.  A jacfwd
        # (P, 10) layout instead puts the 10-wide parameter axis in
        # lanes, which pads to 128 and wastes ~12x of the LM bandwidth.
        if analytic_jac:
            # closed-form J^T: one (10,9)x(9,P) matmul on shared features
            # instead of 10 tangent propagations (r5 fit cut; parity with
            # the linearize path tested in tests/test_fit.py)
            Jt, r = _jt_analytic(params, pixels, coords, maskf,
                                 center_est, delta, min_w, max_w)
        else:
            r, f_jvp = jax.linearize(residual, params)
            # basis derives its varying axes from the data (shard_map-
            # safe: linearize rejects unvarying tangents against varying
            # primals)
            basis = jnp.eye(10, dtype=params.dtype) + 0.0 * params[None]
            Jt = jax.vmap(f_jvp)(basis)                        # (10, P)
        g = jnp.einsum("ip,p->i", Jt, r, precision=_HIGH)
        H = jnp.einsum("ip,jp->ij", Jt, Jt, precision=_HIGH)
        diag = jnp.diagonal(H)
        A = H + lam * jnp.diag(diag) + 1e-8 * jnp.eye(10)
        delta_p = _cg_solve_spd(A, -g)
        new_params = params + delta_p
        new_cost = jnp.sum(residual(new_params) ** 2)
        ok = (new_cost < cost) & jnp.all(jnp.isfinite(new_params))
        params = jnp.where(ok, new_params, params)
        cost = jnp.where(ok, new_cost, cost)
        lam = jnp.where(ok, jnp.maximum(lam / 3.0, 1e-7),
                        jnp.minimum(lam * 3.0, 1e7))
        return params, lam, cost

    cost0 = jnp.sum(residual(params0) ** 2)
    # lam init derives its varying axes from the data (shard_map-safe)
    lam0 = cost0 * 0.0 + 1e-3
    params, _, _ = jax.lax.fori_loop(0, lm_iters, step,
                                     (params0, lam0, cost0))
    r = residual(params)
    n = jnp.maximum(jnp.sum(maskf), 1.0)
    eps = jnp.sum(jnp.abs(r)) / n
    return params, eps


# ---------------------------------------------------------------------------
# Pixel-block gathering and neighbor bookkeeping
# ---------------------------------------------------------------------------


def ball_offsets(radius: int) -> np.ndarray:
    """(P, 3) integer offsets inside the fitting ball, with the reference's
    asymmetric range [-r, r) and |o| <= r filter (iter_fit :580-583) —
    packing only in-ball offsets (~pi/6 of the cube) halves all downstream
    per-pixel work."""
    g = np.indices([2 * radius] * 3).reshape(3, -1).T - radius
    keep = (g ** 2).sum(1) <= radius ** 2
    return g[keep].astype(np.int32)


@partial(jax.jit, static_argnames=("radius",))
def gather_blocks(im: jnp.ndarray, seeds_zxy: jnp.ndarray, radius: int):
    """Gather (N, P) pixel blocks around integer seed positions.

    Returns (pixels, coords, base_mask) where base_mask = in-ball & in-bounds
    (reference iter_fit :580-608: ball of radius r, in_dim bounds check).

    TPU form: one vmapped `dynamic_slice` cube per seed (contiguous DMAs)
    plus a small per-row gather of the in-ball offsets — measured ~1.7x
    faster than the flat big-image gather, whose arbitrary indices defeat
    the TPU's vectorized loads.  Every in-bounds ball pixel provably lies
    inside the clipped (2r)^3 cube.

    A/B'd against keeping the full cube with the ball as a mask (no
    packing gather, ~2x pixels into the LM loop): end-to-end bench
    5.14 -> 4.95 stacks/s (fit stage 144 -> 150 ms), so packing wins —
    the extra masked pixels cost more VPU time in the LM loop than the
    in-context packing gather costs (scripts/ab_gather2.py; isolated
    micro-timings of this gather through the axon tunnel are dominated
    by ~30 ms dispatch latency and cannot be trusted).
    """
    # per-axis cube extent: 2r, clamped to the image (small test stacks
    # can be thinner than the ball along z)
    sides = tuple(min(2 * radius, int(s)) for s in im.shape)
    offs = jnp.asarray(ball_offsets(radius))                # (P, 3)
    base = seeds_zxy.astype(jnp.int32)                       # (N, 3)
    pos = base[:, None, :] + offs[None, :, :]                # (N, P, 3)
    shape = jnp.asarray(im.shape, jnp.int32)
    inb = jnp.all((pos >= 0) & (pos < shape[None, None]), axis=-1)
    imf = im.astype(jnp.float32)
    sides_j = jnp.asarray(sides, jnp.int32)
    origin = jnp.clip(base - radius, 0, shape[None] - sides_j[None])
    cubes = jax.vmap(
        lambda o: jax.lax.dynamic_slice(imf, o, sides))(
        origin)                                              # (N, sz, sx, sy)
    rel = jnp.clip(pos - origin[:, None, :], 0,
                   sides_j[None, None] - 1)
    idx = (rel[..., 0] * sides[1] + rel[..., 1]) * sides[2] + rel[..., 2]
    pixels = jnp.take_along_axis(cubes.reshape(base.shape[0], -1), idx,
                                 axis=1)
    return pixels, pos.astype(jnp.float32), inb


@partial(jax.jit, static_argnames=("max_neighbors", "radius"))
def neighbor_lists(seeds_zxy: jnp.ndarray, valid: jnp.ndarray,
                   max_neighbors: int = 12, radius: int = 5):
    """For each seed, indices of up to K other valid seeds within 2r
    (the interaction range of the Voronoi ownership and subtract-refit,
    reference iter_fit :612 rsearch=2r).  Returns (idx (N,K), nmask (N,K))."""
    n = seeds_zxy.shape[0]
    d2 = jnp.sum((seeds_zxy[:, None].astype(jnp.float32)
                  - seeds_zxy[None].astype(jnp.float32)) ** 2, axis=-1)
    both = valid[:, None] & valid[None, :]
    d2 = jnp.where(both, d2, jnp.inf)
    d2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d2)
    within = d2 <= (2.0 * radius) ** 2
    # take K nearest
    neg = jnp.where(within, -d2, -jnp.inf)
    vals, idx = jax.lax.top_k(neg, min(max_neighbors, n))    # (N, K)
    nmask = jnp.isfinite(vals)
    return idx, nmask


def ownership_mask(coords: jnp.ndarray, seed: jnp.ndarray,
                   neighbor_seeds: jnp.ndarray,
                   nmask: jnp.ndarray) -> jnp.ndarray:
    """Voronoi ownership: pixel belongs to `seed` iff no valid neighbor is
    strictly closer (reference closest_faster :422-424)."""
    d_own = jnp.sum((coords - seed[None].astype(jnp.float32)) ** 2, axis=-1)
    d_nb = jnp.sum((coords[:, None] -
                    neighbor_seeds[None].astype(jnp.float32)) ** 2, axis=-1)
    d_nb = jnp.where(nmask[None], d_nb, jnp.inf)
    return d_own <= jnp.min(d_nb, axis=1)


# ---------------------------------------------------------------------------
# Full iterative fitting pipeline
# ---------------------------------------------------------------------------


class FitResult(NamedTuple):
    spots: jnp.ndarray       # (N, 11) natural-parameter rows
    valid: jnp.ndarray       # (N,) bool
    converged: jnp.ndarray   # (N,) bool — center moved < tol in last round
    n_rounds: jnp.ndarray    # () int32
    n_contested: jnp.ndarray  # () int32 — spots with >= 1 in-range neighbor


@partial(jax.jit, static_argnames=(
    "radius", "min_w", "max_w", "init_w", "min_delta_center",
    "max_delta_center", "lm_iters", "n_max_iter", "max_dist_th",
    "max_neighbors", "max_contested", "analytic_jac", "lm_backend"))
def iter_fit_seed_points(im: jnp.ndarray, seeds_zxy: jnp.ndarray,
                         seeds_valid: jnp.ndarray,
                         radius: int = 5,
                         min_w: float = 0.5, max_w: float = 4.0,
                         init_w: float = 1.5,
                         min_delta_center: float = 1.0,
                         max_delta_center: float = 2.5,
                         lm_iters: int = 30,
                         n_max_iter: int = 10,
                         max_dist_th: float = 0.1,
                         max_neighbors: int = 12,
                         max_contested: Optional[int] = None,
                         analytic_jac: bool = True,
                         lm_backend: str = "auto") -> FitResult:
    """Fit all seeds concurrently with block-synchronous subtract-refit.

    Round 0 mirrors the reference `firstfit` (ownership-masked pixels)
    with one TPU-batch refinement: CONTESTED spots (>= 1 valid neighbor
    within the 2r interaction range) use the narrow firstfit center box
    (delta=min_delta_center) — their pixels still contain neighbors'
    light, so the center stays anchored to the seed until the first
    subtract round — while ISOLATED spots, whose subtract target is zero
    forever, collapse firstfit+repeatfit into ONE wide-box
    (delta=max_delta_center) fit and never enter the Jacobi rounds.  The
    reference's repeatfit visits isolated spots once but subtracts
    nothing; the fixpoint (best fit within the wide box against their
    own pixels) is identical (iter_fit_seed_points :559-683), and at
    real densities < 5% of spots are contested, so this removes the
    dominant repeatfit cost.  Rounds 1..n_max_iter then iterate ONLY the
    contested spots (full ball, neighbors' reconstructions subtracted,
    delta_center=max_delta_center), compacted into a prefix of static
    capacity `max_contested` (default max(128, N/4) rounded up to 128;
    seeds arrive brightest-first so any overflow freezes the dimmest
    contested spots at their round-0 fit — the same brightness priority
    as the reference's sequential order).  Per-spot convergence (center
    step < max_dist_th) is tracked throughout; `n_contested` reports the
    true contested count so callers can detect overflow.
    """
    backend = lm_backend
    if backend == "auto":
        # mirror ops/seeding.py's fused-path gate: the Pallas LM kernel
        # only on real TPU backends; the CPU suite covers it under
        # interpret=True via lm_backend="pallas_interpret"
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    imf = im.astype(jnp.float32)
    n = seeds_zxy.shape[0]
    pixels, coords, base_mask = gather_blocks(imf, seeds_zxy, radius)
    base_mask = base_mask & seeds_valid[:, None]
    nidx, nmask = neighbor_lists(seeds_zxy, seeds_valid,
                                 max_neighbors=max_neighbors, radius=radius)
    centers_est = seeds_zxy.astype(jnp.float32)

    own = jax.vmap(ownership_mask)(coords, seeds_zxy,
                                   seeds_zxy[nidx], nmask)

    contested = jnp.any(nmask, axis=1) & seeds_valid
    n_contested = jnp.sum(contested.astype(jnp.int32))

    # ---- round 0: firstfit (isolated spots directly in the wide box —
    # see docstring; with n_max_iter == 0 every spot keeps the narrow
    # firstfit box, the reference's firstfit-only behavior)
    if n_max_iter >= 1:
        delta0 = jnp.where(contested, min_delta_center, max_delta_center)
    else:
        delta0 = jnp.full(n, min_delta_center, jnp.float32)
    params, eps = _batched_lm(pixels, coords, base_mask & own,
                              centers_est, delta0, min_w, max_w, init_w,
                              lm_iters, None, analytic_jac, backend)

    def natural(p, ce, e, delta):
        return to_natural(p, ce, delta, min_w, max_w, e)

    nat0 = jax.vmap(natural)(params, centers_est, eps, delta0)

    def recon_at(coords_i, nat_rows, which, wmask):
        """Sum of neighbors' peak reconstructions at this spot's pixels.

        nat_rows: (N, 11); which: (K,) neighbor ids; wmask: (K,) validity."""
        nb = nat_rows[which]                                  # (K, 11)

        def one(row, ok):
            h, c1, c2, c3 = row[0], row[1], row[2], row[3]
            wz, wx, wy = row[5], row[6], row[7]
            sin_t, sin_p = row[8], row[9]
            s1 = 1.0 / jnp.maximum(wz * wz, 1e-6)
            s2 = 1.0 / jnp.maximum(wx * wx, 1e-6)
            s3 = 1.0 / jnp.maximum(wy * wy, 1e-6)
            a11, a22, a33, a12, a13, a23 = _quadform_coeffs(
                sin_t, sin_p, s1, s2, s3)
            d = coords_i - jnp.stack([c1, c2, c3])[None]
            q = (a11 * d[:, 0] ** 2 + a22 * d[:, 1] ** 2 + a33 * d[:, 2] ** 2
                 + a12 * d[:, 0] * d[:, 1] + a13 * d[:, 0] * d[:, 2]
                 + a23 * d[:, 1] * d[:, 2])
            return jnp.where(ok, h * jnp.exp(-0.5 * q), 0.0)

        return jnp.sum(jax.vmap(one)(nb, wmask), axis=0)

    # rebase contested round-0 params into the wider repeatfit center box
    # so later rounds warm-start from the current solution (identity for
    # isolated spots, already fitted in the wide box)
    params = jax.vmap(lambda p, ce, dl: rebase_center_params(
        p, ce, dl, max_delta_center))(params, centers_est, delta0)
    repeat_iters = max(8, lm_iters // 3)

    def refit(target_k, coords_k, mask_k, ce_k, p0_k):
        delta_k = jnp.full(target_k.shape[0], max_delta_center,
                           jnp.float32)
        new_params, new_eps = _batched_lm(
            target_k, coords_k, mask_k, ce_k, delta_k, min_w, max_w,
            init_w, repeat_iters, p0_k, analytic_jac, backend)
        new_nat = jax.vmap(
            lambda p, ce, e: natural(p, ce, e, max_delta_center))(
            new_params, ce_k, new_eps)
        return new_params, new_nat

    # ---- rounds 1..n_max_iter: block-synchronous repeatfit over the
    # contested prefix only (isolated spots are final after round 0)
    nat = nat0
    converged = ~contested if n_max_iter >= 1 else jnp.zeros(n, bool)
    rounds_done = jnp.int32(0)
    if max_contested is None:
        cap = min(n, max(128, -(-n // 4 // 128) * 128))
    else:
        cap = max(1, min(n, int(max_contested)))
    if n_max_iter >= 1 and cap > 0:
        order = jnp.argsort(~contested, stable=True)     # contested first
        sel_idx = order[:cap]
        iterating = jnp.zeros(n, bool).at[sel_idx].set(contested[sel_idx])
        pix_k = pixels[sel_idx]
        coords_k = coords[sel_idx]
        mask_k = base_mask[sel_idx]
        ce_k = centers_est[sel_idx]
        nidx_k = nidx[sel_idx]
        nmask_k = nmask[sel_idx]

        def round_body(state):
            i, nat_f, params_k, conv_f = state
            sub_k = jax.vmap(recon_at, in_axes=(0, None, 0, 0))(
                coords_k, nat_f, nidx_k, nmask_k)
            new_params_k, new_nat_k = refit(pix_k - sub_k, coords_k,
                                            mask_k, ce_k, params_k)
            moved2_k = jnp.sum(
                (new_nat_k[:, 1:4] - nat_f[sel_idx, 1:4]) ** 2, axis=1)
            conv_k = moved2_k < max_dist_th ** 2
            return (i + 1, nat_f.at[sel_idx].set(new_nat_k),
                    new_params_k, conv_f.at[sel_idx].set(conv_k))

        def round_cond(state):
            i, _, _, conv_f = state
            return (i < n_max_iter) & ~jnp.all(conv_f | ~iterating)

        rounds_done, nat, _params_k, converged = jax.lax.while_loop(
            round_cond, round_body,
            (rounds_done, nat, params[sel_idx], converged))

    # validity: seed valid, finite row, center strictly inside image
    finite = jnp.all(jnp.isfinite(nat), axis=1)
    inside = jnp.all((nat[:, 1:4] > 0)
                     & (nat[:, 1:4] < jnp.asarray(imf.shape,
                                                  jnp.float32)[None]),
                     axis=1)
    enough_px = jnp.sum(base_mask.astype(jnp.int32), axis=1) > 10
    valid = seeds_valid & finite & inside & enough_px
    return FitResult(spots=nat, valid=valid, converged=converged,
                     n_rounds=rounds_done, n_contested=n_contested)


@partial(jax.jit, static_argnames=("bin_size",))
def find_image_background(im: jnp.ndarray, bin_size: int = 10,
                          vmax: float = 65535.0) -> jnp.ndarray:
    """Background level = center of the histogram's dominant local peak.

    Behavior target: reference io_tools/load.py:642-687
    (find_image_background): histogram with `bin_size`-wide bins over the
    dtype range, select the highest peak.  The reference's iterative
    height-threshold halving always terminates at any local maximum, so
    the TPU form takes the highest-count interior local maximum directly
    (median fallback when the histogram is monotonic).
    """
    imf = im.astype(jnp.float32)
    n_bins = int(vmax) // int(bin_size)
    idx = jnp.clip((imf / bin_size).astype(jnp.int32), 0, n_bins - 1)
    cts = jnp.bincount(idx.ravel(), length=n_bins)
    left = jnp.roll(cts, 1).at[0].set(jnp.iinfo(jnp.int32).max)
    right = jnp.roll(cts, -1).at[-1].set(jnp.iinfo(jnp.int32).max)
    is_peak = (cts > left) & (cts >= right)
    any_peak = jnp.any(is_peak)
    best = jnp.argmax(jnp.where(is_peak, cts, -1))
    peak_val = (best.astype(jnp.float32) + 0.5) * bin_size
    from .filters import counting_median
    return jnp.where(any_peak, peak_val, counting_median(imf))


def fit_fov_image(im: jnp.ndarray,
                  seeds: Optional[Seeds] = None,
                  max_num_seeds: int = 512,
                  th_seed: float = 300.0,
                  radius: int = 5,
                  lm_iters: int = 30,
                  n_max_iter: int = 10,
                  normalize_background: bool = False,
                  **seed_kwargs) -> FitResult:
    """Seed + iteratively fit one image (reference spot_tools/fitting.py:169).

    Returns a fixed-capacity FitResult; rows are the reference 11-column
    spot format [h, z, x, y, bk, wz, wx, wy, sin_t, sin_p, eps].  With
    `normalize_background`, spot heights are divided by the image
    background level (reference :240-247), the convention downstream
    intensity-based scoring assumes.
    """
    if seeds is None:
        seeds = get_seeds(im, max_num_seeds=max_num_seeds, th_seed=th_seed,
                          **seed_kwargs)
    res = iter_fit_seed_points(im, seeds.coords.astype(jnp.float32),
                               seeds.valid, radius=radius,
                               lm_iters=lm_iters, n_max_iter=n_max_iter)
    if normalize_background:
        back = jnp.maximum(find_image_background(im), 1e-6)
        res = res._replace(spots=res.spots.at[:, 0].set(res.spots[:, 0]
                                                        / back))
    return res


def get_centers(im: jnp.ndarray, seeds: Optional[Seeds] = None,
                th_seed: float = 150.0, max_num_seeds: int = 512,
                radius: int = 5, remove_close_pts: bool = True,
                close_threshold: float = 0.1,
                **kwargs) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fitted spot centers of one image -> ((N, 3) zxy, valid mask).

    Behavior target: reference spot_tools/fitting.py:268-330 (get_centers):
    seed + fit, then drop near-duplicate centers within `close_threshold`.
    """
    res = fit_fov_image(im, seeds=seeds, max_num_seeds=max_num_seeds,
                        th_seed=th_seed, radius=radius, **kwargs)
    centers = res.spots[:, 1:4]
    valid = res.valid
    if remove_close_pts:
        valid = valid & _dedupe_mask(centers, valid, close_threshold)
    return centers, valid


@partial(jax.jit, static_argnames=())
def _dedupe_mask(centers: jnp.ndarray, valid: jnp.ndarray,
                 threshold: float) -> jnp.ndarray:
    """Keep the first of any group of centers closer than `threshold`."""
    n = centers.shape[0]
    d = jnp.linalg.norm(centers[:, None] - centers[None], axis=-1)
    both = valid[:, None] & valid[None]
    close = (d < threshold) & both
    earlier = jnp.arange(n)[None, :] < jnp.arange(n)[:, None]
    return ~jnp.any(close & earlier, axis=1)


@partial(jax.jit, static_argnames=())
def select_sparse_centers(centers: jnp.ndarray, valid: jnp.ndarray,
                          distance_th: float = 25.0) -> jnp.ndarray:
    """Greedy selection of mutually distant centers (first-come priority).

    Behavior target: reference spot_tools/fitting.py select_sparse_centers
    (:332-363): walk centers in order, keep one iff it is at least
    `distance_th` away from every previously kept center.  Returns the
    kept mask.  Used to pick isolated beads for chromatic / bleedthrough
    profile fitting.
    """
    n = centers.shape[0]
    d = jnp.linalg.norm(centers[:, None] - centers[None], axis=-1)

    def body(i, kept):
        near_kept = jnp.any(kept & (d[i] < distance_th)
                            & (jnp.arange(n) != i))
        keep_i = valid[i] & ~near_kept
        return kept.at[i].set(keep_i)

    return jax.lax.fori_loop(0, n, body, jnp.zeros(n, bool))


@partial(jax.jit, static_argnames=("bk_fraction", "reconstruct"))
def gfit_fast(pixels: jnp.ndarray, coords: jnp.ndarray,
              mask: jnp.ndarray, bk_fraction: float = 0.1,
              reconstruct: bool = False) -> jnp.ndarray:
    """Moment-based fast Gaussian fit of one pixel block.

    Behavior target: reference gfit_fast (External/Fitting_v4.py:433-490):
    background = the `bk_fraction` quantile, weights = clipped excess over
    background, position = intensity-weighted centroid, shape = weighted
    covariance.  Returns the reference's 12-vector
    [h, z, x, y, bk, a, b, c, d, e, f, eps] (covariance entries in the
    reference's ordering; eps = mean |residual| when `reconstruct`, else
    NaN).  Batched use: ``jax.vmap(gfit_fast)`` over gathered blocks —
    a cheap screen/initializer where the full LM engine is overkill.
    """
    maskf = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(maskf), 1.0)
    # bk = sorted(im)[int(n * bk_f)] over the valid pixels
    s = jnp.sort(jnp.where(mask, pixels, jnp.inf))
    k = jnp.clip((n * bk_fraction).astype(jnp.int32), 0,
                 pixels.shape[0] - 1)
    bk = s[k]
    w = jnp.maximum(pixels - bk, 0.0) * maskf
    h = jnp.max(w)
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    wn = w / wsum
    zxy = jnp.sum(coords * wn[:, None], axis=0)
    d = coords - zxy[None]
    cov = jnp.einsum("pi,pj,p->ij", d, d, wn)
    a, b, c = cov[0, 0], cov[1, 1], cov[2, 2]
    dd, e, f = cov[0, 1], cov[0, 2], cov[1, 2]
    if reconstruct:
        icov = jnp.linalg.inv(cov + 1e-9 * jnp.eye(3))
        q = jnp.einsum("pi,ij,pj->p", d, icov, d)
        fit = h * jnp.exp(-0.5 * q) + bk
        eps = jnp.sum(jnp.abs(pixels - fit) * maskf) / n
    else:
        eps = jnp.nan
    return jnp.stack([h, zxy[0], zxy[1], zxy[2], bk, a, b, c, dd, e, f,
                      eps])
