"""Homolog assignment: two planted homolog traces recovered from merged
decoded groups (reference DNA_Merfish_Decoder, classes/decode.py:694-2213).
"""

import numpy as np
import jax.numpy as jnp

from imageanalysis3_tpu.decode import homolog as H


def _two_homolog_cell(rng, n_regions=25, step=250.0, sep=6000.0):
    """Two random-walk homolog traces, merged group table with noise."""
    base_a = np.array([2000.0, 4000.0, 4000.0])
    base_b = base_a + np.array([0.0, sep, sep])
    tr_a = base_a + np.cumsum(rng.normal(0, step / np.sqrt(3),
                                         (n_regions, 3)), axis=0)
    tr_b = base_b + np.cumsum(rng.normal(0, step / np.sqrt(3),
                                         (n_regions, 3)), axis=0)
    cents, rids, truth = [], [], []
    for r in range(n_regions):
        for t, tr in ((0, tr_a), (1, tr_b)):
            cents.append(tr[r] + rng.normal(0, 50, 3))
            rids.append(r)
            truth.append(t)
    # decoys: far-flung false groups
    for _ in range(10):
        cents.append(rng.uniform(15000, 30000, 3))
        rids.append(int(rng.integers(0, n_regions)))
        truth.append(-1)
    return (np.asarray(cents, np.float32), np.asarray(rids, np.int32),
            np.asarray(truth), tr_a, tr_b)


def test_init_homolog_centers_separates():
    rng = np.random.default_rng(0)
    cents, rids, truth, tr_a, tr_b = _two_homolog_cell(rng)
    valid = truth >= 0
    c1, c2 = H.init_homolog_centers(jnp.asarray(cents), jnp.asarray(rids),
                                    jnp.asarray(valid))
    c1, c2 = np.asarray(c1), np.asarray(c2)
    ma, mb = tr_a.mean(0), tr_b.mean(0)
    d_same = min(np.linalg.norm(c1 - ma) + np.linalg.norm(c2 - mb),
                 np.linalg.norm(c1 - mb) + np.linalg.norm(c2 - ma))
    # both centers land on distinct homolog territories
    assert np.linalg.norm(c1 - c2) > 3000.0
    assert d_same < 6000.0


def test_assign_groups_recovers_homolog_traces():
    rng = np.random.default_rng(1)
    cents, rids, truth, tr_a, tr_b = _two_homolog_cell(rng)
    n_regions = 25
    g = len(cents)
    ints = np.where(truth >= 0, rng.uniform(900, 1500, g),
                    rng.uniform(400, 800, g)).astype(np.float32)
    inner = np.where(truth >= 0, rng.uniform(50, 150, g),
                     rng.uniform(300, 600, g)).astype(np.float32)
    valid = np.ones(g, bool)
    init = jnp.asarray(np.stack([tr_a.mean(0) + rng.normal(0, 500, 3),
                                 tr_b.mean(0) + rng.normal(0, 500, 3)]),
                       jnp.float32)
    res = H.assign_groups_to_homologs(
        jnp.asarray(cents), jnp.asarray(ints), jnp.asarray(inner),
        jnp.asarray(rids), jnp.asarray(valid), init, n_regions=n_regions)
    flags = np.asarray(res.flags)
    # orientation: homolog 0 should correspond to one of the planted traces
    f_a = flags[truth == 0]
    f_b = flags[truth == 1]
    maj_a = np.bincount(f_a[f_a >= 0], minlength=2).argmax()
    maj_b = 1 - maj_a
    acc_a = (f_a == maj_a).mean()
    acc_b = (f_b == maj_b).mean()
    assert acc_a >= 0.9 and acc_b >= 0.9, (acc_a, acc_b)
    # traces summarize per region
    zxys = np.asarray(res.zxys)
    okz = np.asarray(res.zxys_valid)
    assert zxys.shape == (2, n_regions, 3)
    tr = {maj_a: tr_a, maj_b: tr_b}
    for hh in (0, 1):
        err = np.linalg.norm(np.where(okz[hh][:, None], zxys[hh]
                                      - tr[hh], 0.0), axis=1)
        assert okz[hh].mean() >= 0.85
        assert np.median(err[okz[hh]]) < 200.0


def test_decode_chromosome_homologs_front_door():
    """SpotGroups-shaped input through the host front door."""
    from imageanalysis3_tpu.decode.merfish import SpotGroups

    rng = np.random.default_rng(2)
    n_regions = 15
    cents, rids, truth, tr_a, tr_b = _two_homolog_cell(
        rng, n_regions=n_regions)
    g = len(cents)
    # synthesize spots: each group = 3 spots around its centroid
    px = np.array([200.0, 108.0, 108.0])
    spots = np.zeros((g * 3, 11), np.float32)
    spot_idx = np.full((g, 4), -1, np.int32)
    for k in range(g):
        for j in range(3):
            spots[k * 3 + j, 1:4] = (cents[k] + rng.normal(0, 40, 3)) / px
            spots[k * 3 + j, 0] = rng.uniform(800, 1500)
        spot_idx[k, :3] = np.arange(k * 3, k * 3 + 3)
    groups = SpotGroups(
        spot_idx=jnp.asarray(spot_idx),
        region=jnp.asarray(rids + 100),
        n_spots=jnp.full(g, 3, jnp.int32),
        ok=jnp.ones(g, bool),
        spot_usage=jnp.zeros(g * 3, jnp.int32))
    res = H.decode_chromosome_homologs(groups, spots, rids + 100)
    assert np.asarray(res.zxys).shape[1] == n_regions
    flags = np.asarray(res.flags)
    real = truth >= 0
    assert (flags[real] >= 0).mean() > 0.7
