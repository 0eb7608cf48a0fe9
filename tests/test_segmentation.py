"""Nuclei segmentation + chromosome candidates on synthetic blobs.

Behavior targets: reference visual_tools.py:1092-1606 (DAPI watershed)
and segmentation_tools/chromosome.py:51-486.
"""

import numpy as np
import jax
import jax.numpy as jnp

from imageanalysis3_tpu import segmentation as SG
from imageanalysis3_tpu import synthetic as syn


def _nuclei_image(rng, shape=(12, 96, 96), centers=None):
    if centers is None:
        centers = np.array([[6, 24, 24], [6, 24, 70], [6, 70, 46]], float)
    heights = np.full(len(centers), 2000.0)
    sigmas = np.tile([3.0, 8.0, 8.0], (len(centers), 1))
    im = syn.render_gaussian_spots(shape, centers, heights, sigmas,
                                   background=80.0)
    return im.astype(np.float32), centers


def test_otsu_threshold_bimodal():
    rng = np.random.default_rng(0)
    x = np.concatenate([rng.normal(100, 10, 4000),
                        rng.normal(1000, 50, 1000)]).astype(np.float32)
    th = float(SG.otsu_threshold(jnp.asarray(x.reshape(50, -1))))
    assert 200 < th < 900


def test_propagate_labels_splits_touching_regions():
    mask = np.zeros((4, 20, 20), bool)
    mask[:, 2:18, 2:18] = True
    seeds = np.zeros((4, 20, 20), np.int32)
    seeds[2, 10, 4] = 1
    seeds[2, 10, 15] = 2
    labels = np.asarray(SG.propagate_labels(jnp.asarray(seeds),
                                            jnp.asarray(mask),
                                            max_iters=64))
    assert labels[2, 10, 3] == 1
    assert labels[2, 10, 16] == 2
    # divide roughly in the middle
    assert labels[2, 10, 8] == 1 and labels[2, 10, 12] == 2
    assert (labels[~mask] == 0).all()


def test_segment_nuclei_labels_each_blob():
    rng = np.random.default_rng(1)
    im, centers = _nuclei_image(rng)
    labels, coords, valid = SG.segment_nuclei(
        jnp.asarray(im), smooth_sigma=2.0, seed_min_distance=15.0,
        max_num_nuclei=16, min_size_voxels=100, max_iters=64)
    labels = np.asarray(labels)
    got = {labels[tuple(np.round(c).astype(int))] for c in centers}
    assert len(got) == 3 and 0 not in got
    n_labels = len(np.unique(labels)) - 1
    assert n_labels == 3


def test_find_candidate_chromosomes():
    rng = np.random.default_rng(2)
    im, centers = _nuclei_image(rng)
    labels, _, _ = SG.segment_nuclei(
        jnp.asarray(im), smooth_sigma=2.0, seed_min_distance=15.0,
        max_num_nuclei=16, min_size_voxels=100, max_iters=64)
    # plant 2 chromosome puncta per nucleus
    offsets = np.array([[0, -4, -4], [0, 4, 4]], float)
    chrom_centers = np.concatenate([c + offsets for c in centers])
    chrom = syn.render_gaussian_spots(
        (12, 96, 96), chrom_centers, np.full(6, 3000.0),
        np.tile([1.2, 1.6, 1.6], (6, 1)), background=100.0)
    # decoys outside nuclei
    noise = syn.render_gaussian_spots(
        (12, 96, 96), np.array([[6, 5, 90.0]]), np.array([3000.0]),
        np.array([[1.2, 1.6, 1.6]]), background=0.0)
    coords, nuc_labels, counts = SG.find_candidate_chromosomes(
        jnp.asarray((chrom + noise).astype(np.float32)), labels,
        expected_per_nucleus=2, th_seed=800.0)
    assert sorted(counts.values()) == [2, 2, 2]
    for c in chrom_centers:
        d = np.linalg.norm(coords - c, axis=1).min()
        assert d < 2.0


def test_find_candidate_chromosomes_per_cell_adaptive():
    """One dim and one bright nucleus must BOTH reach
    expected_per_nucleus — the per-cell threshold selection must not
    starve the dim nucleus at a global (median-nucleus) level
    (reference per-cell loop, segmentation_tools/chromosome.py:51-486)."""
    rng = np.random.default_rng(5)
    centers = np.array([[6, 24, 24], [6, 70, 70]], float)
    im, _ = _nuclei_image(rng, centers=centers)
    labels, _, _ = SG.segment_nuclei(
        jnp.asarray(im), smooth_sigma=2.0, seed_min_distance=15.0,
        max_num_nuclei=16, min_size_voxels=100, max_iters=64)
    offsets = np.array([[0, -4, -4], [0, 4, 4]], float)
    # nucleus 1: bright foci (3000); nucleus 2: 10x dimmer foci (300),
    # still above the decayed per-cell floor but far below any global
    # threshold the bright nucleus would set
    chrom_centers = np.concatenate([c + offsets for c in centers])
    heights = np.array([3000.0, 3000.0, 300.0, 300.0])
    chrom = syn.render_gaussian_spots(
        (12, 96, 96), chrom_centers, heights,
        np.tile([1.2, 1.6, 1.6], (4, 1)), background=50.0)
    coords, nuc_labels, counts = SG.find_candidate_chromosomes(
        jnp.asarray(chrom.astype(np.float32)), labels,
        expected_per_nucleus=2, th_seed=800.0)
    assert sorted(counts.values()) == [2, 2]
    for c in chrom_centers:
        d = np.linalg.norm(coords - c, axis=1).min()
        assert d < 2.0
    # dim foci mapped to the dim nucleus, not duplicated on the bright one
    dim_label = labels[6, 70, 70]
    assert (np.asarray(nuc_labels) == int(dim_label)).sum() == 2


# ---------------------------------------------------------------------------
# Segmentation depth (reference segmentation_tools/cell.py:31-362, 614-656)
# ---------------------------------------------------------------------------


def _ellipsoid_mask(shape, center, radii_vox):
    zz, xx, yy = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    d2 = (((zz - center[0]) / radii_vox[0]) ** 2
          + ((xx - center[1]) / radii_vox[1]) ** 2
          + ((yy - center[2]) / radii_vox[2]) ** 2)
    return d2 <= 1.0


def test_segment_cells_touching_nuclei_iou():
    """Two touching nuclei with anisotropic voxels: per-cell IoU >= 0.9
    vs truth; the polyT halo expands each cell beyond its nucleus
    (reference Cellpose_Segmentation_3D.run semantics)."""
    shape = (16, 96, 96)
    px = (250.0, 108.0, 108.0)
    rng = np.random.default_rng(0)
    # nuclei: ~1.8 um radius spheres in nm -> anisotropic voxel radii
    r_nm = 1800.0
    radii = np.array([r_nm / px[0], r_nm / px[1], r_nm / px[2]])
    c1 = np.array([8.0, 38.0, 48.0])
    c2 = np.array([8.0, 68.0, 48.0])     # touching along x (gap < 2*r)
    m1 = _ellipsoid_mask(shape, c1, radii)
    m2 = _ellipsoid_mask(shape, c2, radii)
    # overlap voxels assigned to the nearer center (ground truth split)
    both = m1 & m2
    zz, xx, yy = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    vox = np.stack([zz, xx, yy], -1).astype(float) * np.asarray(px) / 108.0
    d1 = np.linalg.norm(vox - c1 * np.asarray(px) / 108.0, axis=-1)
    d2 = np.linalg.norm(vox - c2 * np.asarray(px) / 108.0, axis=-1)
    t1 = (m1 & ~both) | (both & (d1 <= d2))
    t2 = (m2 & ~both) | (both & (d1 > d2))

    dapi = 100.0 + 900.0 * (t1 | t2) + rng.normal(0, 5, shape)
    # polyT cytoplasm: a wider halo around both nuclei
    halo = _ellipsoid_mask(shape, c1, radii * 1.5) | \
        _ellipsoid_mask(shape, c2, radii * 1.5)
    polyt = 100.0 + 600.0 * halo + rng.normal(0, 5, shape)

    cells, nuclei = SG.segment_cells(
        jnp.asarray(dapi, jnp.float32), jnp.asarray(polyt, jnp.float32),
        pixel_sizes=px, smooth_sigma=2.0, seed_min_distance=25.0,
        max_num_nuclei=8, min_size_voxels=100)
    cells = np.asarray(cells)
    nuclei = np.asarray(nuclei)
    got_ids = np.unique(cells)
    got_ids = got_ids[got_ids > 0]
    assert len(got_ids) == 2, got_ids
    # match got labels to truth by overlap, check nucleus IoU >= 0.9
    for t in (t1, t2):
        best = max(got_ids,
                   key=lambda g: np.sum((nuclei == g) & t))
        inter = np.sum((nuclei == best) & t)
        union = np.sum((nuclei == best) | t)
        assert inter / union >= 0.9, inter / union
    # polyT expansion: cells extend beyond nuclei
    assert (cells > 0).sum() > (nuclei > 0).sum() * 1.3


def test_merge_z_layer_masks():
    masks = np.zeros((3, 16, 16), np.int32)
    masks[0, 2:8, 2:8] = 1       # same cell across layers, different ids
    masks[1, 2:8, 2:8] = 2
    masks[2, 3:8, 2:8] = 5
    masks[1, 10:15, 10:15] = 3   # a different cell
    merged = SG.merge_z_layer_masks(masks, overlap_th=0.8)
    assert merged[0, 4, 4] == merged[1, 4, 4] == merged[2, 4, 4]
    assert merged[1, 12, 12] != merged[1, 4, 4]
    assert set(np.unique(merged)) == {0, 1, 2}


def test_interpolate_z_masks_nearest():
    z_masks = np.stack([np.full((4, 4), 1), np.full((4, 4), 2),
                        np.full((4, 4), 3)])
    z = np.array([0.0, 1.0, 2.0])
    target = np.array([0.0, 0.4, 0.6, 1.9, 2.5])
    out = SG.interpolate_z_masks(z_masks, z, target)
    assert [int(m[0, 0]) for m in out] == [1, 1, 2, 3, 3]
    assert out.shape == (5, 4, 4)


# ---------------------------------------------------------------------------
# Learned segmentation backend (reference segmentation_tools/cell.py:192-362,
# cellpose-style flows in functional JAX)
# ---------------------------------------------------------------------------


def _two_cell_labels(shape=(8, 48, 48)):
    truth = np.zeros(shape, np.int32)
    truth[_ellipsoid_mask(shape, (4, 16, 22), (3, 10, 10))] = 1
    truth[_ellipsoid_mask(shape, (4, 32, 26), (3, 10, 10))] = 2
    return truth


def _iou(a, b):
    return (a & b).sum() / max((a | b).sum(), 1)


def test_masks_from_flows_recovers_touching_cells():
    """The dynamics step alone (analytic truth flows) must separate two
    touching cells with high IoU — this isolates the cellpose-dynamics
    reconstruction from the network."""
    from imageanalysis3_tpu.segmentation import learned as L

    truth = _two_cell_labels()
    flow, fg = L.labels_to_flows(truth)
    labels = np.asarray(L.masks_from_flows(
        jnp.asarray(flow), jnp.where(jnp.asarray(fg), 5.0, -5.0),
        max_cells=8, min_count=10))
    assert labels.max() == 2
    ious = []
    for t in (1, 2):
        best = max(_iou(labels == l, truth == t)
                   for l in range(1, labels.max() + 1))
        ious.append(best)
    assert min(ious) > 0.8, ious


def test_unet_apply_shapes_and_weight_io(tmp_path):
    from imageanalysis3_tpu.segmentation import learned as L

    params = L.init_unet_params(jax.random.PRNGKey(0), in_channels=2,
                                base=8, levels=2)
    im = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 6, 32, 32)).astype(np.float32))
    flow, logits = L.unet_apply(params, im)
    assert flow.shape == (3, 6, 32, 32) and logits.shape == (6, 32, 32)
    assert np.isfinite(np.asarray(flow)).all()
    p = str(tmp_path / "w.npz")
    L.save_weights(params, p)
    back = L.load_weights(p, params)
    f2, _ = L.unet_apply(back, im)
    np.testing.assert_allclose(np.asarray(flow), np.asarray(f2))


def test_fit_unet_segments_synthetic_nuclei():
    """Credibility: a tiny UNet fine-tuned on synthetic nuclei must
    reach IoU >= 0.6 per cell through the full learned path
    (net -> flows -> masks).  Fails if the trainer or dynamics regress."""
    from imageanalysis3_tpu.segmentation import learned as L

    truth = _two_cell_labels()
    rng = np.random.default_rng(2)
    im = (truth > 0).astype(np.float32) * 900.0 + 100.0
    im = im + rng.normal(0, 30.0, im.shape).astype(np.float32)
    im = im[None]                                     # (C=1, Z, X, Y)

    params = L.init_unet_params(jax.random.PRNGKey(1), in_channels=1,
                                base=8, levels=2)
    params = L.fit_unet(params, [im], [truth], n_steps=150, lr=2e-3)
    labels = np.asarray(L.segment_cells_learned(
        jnp.asarray(im), params, max_cells=8, min_count=10))
    assert labels.max() >= 2
    ious = []
    for t in (1, 2):
        best = max(_iou(labels == l, truth == t)
                   for l in range(1, labels.max() + 1))
        ious.append(best)
    assert min(ious) > 0.6, ious


def test_segment_fov_learned_downsample_roundtrip():
    """Full-FOV wrapper: pool -> segment -> nearest upsample preserves
    cell identity and covers the full output shape (the reference's
    resize round trip, segmentation_tools/cell.py:214-240)."""
    from imageanalysis3_tpu.segmentation import learned as L

    truth = _two_cell_labels(shape=(6, 50, 46))     # non-divisible xy
    im = ((truth > 0).astype(np.float32) * 900.0 + 100.0)[None]
    # Train at the pooled working resolution — the wrapper's contract
    # (cellpose's fixed-diameter calibration plays the same role).
    im_c, truth_c = im[:, :, ::2, ::2], truth[:, ::2, ::2]
    params = L.init_unet_params(jax.random.PRNGKey(4), in_channels=1,
                                base=8, levels=2)
    params = L.fit_unet(params, [im_c], [truth_c], n_steps=120,
                        lr=2e-3)
    labels = np.asarray(L.segment_fov_learned(
        jnp.asarray(im), params, downsample=(1, 2, 2),
        max_cells=8, min_count=10))
    assert labels.shape == truth.shape
    assert labels.max() >= 2
    ious = []
    for t in (1, 2):
        best = max(_iou(labels == l, truth == t)
                   for l in range(1, labels.max() + 1))
        ious.append(best)
    assert min(ious) > 0.5, ious


# ---------------------------------------------------------------------------
# Label screens + oversized splitting (reference visual_tools.py:1440-1580)
# ---------------------------------------------------------------------------


def test_shape_ratio_disc_vs_snake():
    xx, yy = np.meshgrid(np.arange(40), np.arange(40), indexing="ij")
    disc = (xx - 20) ** 2 + (yy - 20) ** 2 <= 12 ** 2
    snake = np.zeros((40, 40), bool)
    snake[5, 2:38] = True
    snake[5:20, 37] = True
    assert SG.shape_ratio(disc) > 0.05
    # a 1-px-wide line degenerates to 1/area
    assert SG.shape_ratio(snake) <= 0.02
    assert SG.shape_ratio(np.zeros((10, 10), bool)) == 0.0


def test_screen_labels_size_shape_boundary():
    labels = np.zeros((4, 60, 60), np.int32)
    labels[:, 20:32, 20:32] = 1            # good: round-ish, interior
    labels[:, 40:41, 5:55] = 2             # snake: 1px-wide line
    labels[:, 2:12, 2:12] = 3              # touches boundary margin
    labels[0, 50, 50] = 4                  # tiny
    out = SG.screen_labels(labels, min_size_voxels=20,
                           min_shape_ratio=0.03, boundary_margin=4)
    kept = set(np.unique(out)) - {0}
    assert kept == {1}
    assert (out[:, 20:32, 20:32] == 1).all()


def test_split_oversized_nuclei_separates_merged_pair():
    shape = (8, 64, 64)
    im = np.asarray(syn.render_gaussian_spots(
        shape, np.array([[4.0, 24.0, 32.0], [4.0, 44.0, 32.0]]),
        np.array([2000.0, 2000.0]), np.tile([2.5, 7.0, 7.0], (2, 1)),
        background=60.0), np.float32)
    # one merged label covering both nuclei
    zz, xx, yy = np.meshgrid(*[np.arange(s) for s in shape],
                             indexing="ij")
    merged = (((xx - 24) ** 2 / 100 + (yy - 32) ** 2 / 100
               + (zz - 4) ** 2 / 9) <= 1.0) \
        | (((xx - 44) ** 2 / 100 + (yy - 32) ** 2 / 100
            + (zz - 4) ** 2 / 9) <= 1.0)
    labels = merged.astype(np.int32)
    size = int(merged.sum())
    out = SG.split_oversized_nuclei(im, labels,
                                    max_size_voxels=size // 2,
                                    seed_min_distance=10.0)
    ids = set(np.unique(out)) - {0}
    assert len(ids) == 2, ids
    assert out[4, 24, 32] != out[4, 44, 32]
    assert (out > 0).sum() == size          # support preserved
    # an already-small label is untouched
    small = np.zeros_like(labels)
    small[:, 10:14, 10:14] = 1
    same = SG.split_oversized_nuclei(im, small, max_size_voxels=10_000)
    assert (same == small).all()


def test_label_bboxes_match_bruteforce():
    rng = np.random.default_rng(7)
    labels = rng.integers(0, 5, size=(6, 30, 30)).astype(np.int32)
    from imageanalysis3_tpu.segmentation.nuclei import _label_bboxes
    sizes, mins, maxs = _label_bboxes(labels)
    for l in range(1, 5):
        pos = np.array(np.nonzero(labels == l))
        assert sizes[l] == pos.shape[1]
        assert (mins[l] == pos.min(1)).all()
        assert (maxs[l] == pos.max(1)).all()


def test_select_candidate_chromosomes_removes_unsupported():
    """Iterative loss-based screening (segmentation_tools/chromosome.py:
    363-408): a candidate with no nearby spots in most rounds is removed,
    and its spots re-assign to the survivors."""
    from imageanalysis3_tpu.segmentation import select_candidate_chromosomes

    rng = np.random.default_rng(4)
    good = np.array([[5.0, 20.0, 20.0], [5.0, 60.0, 60.0]])
    bad = np.array([[5.0, 40.0, 40.0]])     # between the two good ones
    cands = np.concatenate([good, bad])

    def round_spots(miss_bad):
        rows = []
        for c in good:
            rows.append([1.0, *(c + rng.normal(0, 0.5, 3))])
        if not miss_bad:
            rows.append([1.0, *(bad[0] + rng.normal(0, 0.5, 3))])
        rows.append([0.1, *(bad[0])])        # below intensity threshold
        return np.asarray(rows)

    # bad candidate has spots in only 4 of 10 rounds -> loss 0.6 > 0.4
    spots_list = [round_spots(miss_bad=(k % 5 != 0)) for k in range(10)]
    sel, kept = select_candidate_chromosomes(
        cands, spots_list, cand_spot_intensity_th=0.5,
        good_chr_loss_th=0.4)
    assert kept.tolist() == [True, True, False]
    np.testing.assert_array_equal(sel, good)

    # with a permissive loss threshold everything survives
    _, kept_all = select_candidate_chromosomes(
        cands, spots_list, good_chr_loss_th=0.95)
    assert kept_all.all()

    # empty candidates / empty rounds degenerate cleanly
    sel0, kept0 = select_candidate_chromosomes(np.zeros((0, 3)), spots_list)
    assert len(sel0) == 0 and len(kept0) == 0


def test_fit_unet_textured_nuclei_iou_distribution():
    """Raised learned-path quality gate (VERDICT r4): TEXTURED nuclei —
    per-nucleus intensity gradients, multiplicative speckle, uneven
    background, and a touching pair — must segment at per-cell
    IoU > 0.8 through the full trained path (net -> flows -> dynamics).
    The IoU distribution is asserted per cell, not pooled, so one bad
    nucleus fails the gate."""
    from imageanalysis3_tpu.segmentation import learned as L

    shape = (8, 72, 72)
    truth = np.zeros(shape, np.int32)
    # touching pair + two isolated nuclei
    truth[_ellipsoid_mask(shape, (4, 18, 20), (3, 9, 9))] = 1
    truth[_ellipsoid_mask(shape, (4, 34, 26), (3, 9, 9))] = 2
    truth[_ellipsoid_mask(shape, (4, 54, 50), (3, 8, 10))] = 3
    truth[_ellipsoid_mask(shape, (4, 18, 52), (3, 8, 8))] = 4

    rng = np.random.default_rng(5)
    im = np.full(shape, 80.0, np.float32)
    # uneven background: smooth xy ramp
    yy, xx = np.meshgrid(np.linspace(0, 40, shape[2]),
                         np.linspace(0, 25, shape[1]))
    im += (xx + yy)[None].astype(np.float32)
    for t in range(1, 5):
        m = truth == t
        # per-nucleus brightness + linear internal gradient along a
        # random direction (chromatin-like unevenness)
        base = rng.uniform(500.0, 1100.0)
        gdir = rng.normal(0, 1, 3)
        gdir /= np.linalg.norm(gdir)
        zz, xxs, yys = np.nonzero(m)
        proj = (np.stack([zz, xxs, yys], 1)
                - np.array([np.mean(zz), np.mean(xxs), np.mean(yys)])) \
            @ gdir
        im[m] += base * (1.0 + 0.35 * proj / max(np.abs(proj).max(),
                                                 1e-6))
    # multiplicative speckle + read noise
    im *= rng.lognormal(0.0, 0.15, shape).astype(np.float32)
    im += rng.normal(0, 25.0, shape).astype(np.float32)
    im = im[None]

    params = L.init_unet_params(jax.random.PRNGKey(3), in_channels=1,
                                base=12, levels=2)
    params = L.fit_unet(params, [im], [truth], n_steps=400, lr=2e-3)
    labels = np.asarray(L.segment_cells_learned(
        jnp.asarray(im), params, max_cells=8, min_count=10))
    assert labels.max() >= 4
    ious = []
    for t in range(1, 5):
        best = max(_iou(labels == l, truth == t)
                   for l in range(1, labels.max() + 1))
        ious.append(round(float(best), 3))
    # published distribution: fails below 0.8 per cell
    assert min(ious) > 0.8, f"per-cell IoU {ious}"
