"""FastCollateMixup: collate-time uint8 mixup/cutmix semantics.

Mirrors /root/reference/src/datasets/mixup.py:241-336 behavior: uint8 in /
uint8 out with np.rint blending, box swap for cutmix, per-mode lam vectors,
half-batch emission, and soft-target construction from the FULL label list.
"""

import numpy as np
import pytest

from unite_tpu.data.collate_mixup import (FastCollateMixup, host_mixup_target,
                                          _cutmix_box_and_lam)


def _items(b=8, t=2, h=16, w=16, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return [(rng.integers(0, 256, (t, h, w, c), dtype=np.uint8), i % 4)
            for i in range(b)]


def test_elem_mixup_blend_is_rint_uint8():
    mix = FastCollateMixup(mixup_alpha=0.8, cutmix_alpha=0.0, prob=1.0,
                           mode="elem", label_smoothing=0.0, num_classes=4,
                           seed=3)
    items = _items()
    # replay the lam draws with an identical generator to predict the blend
    twin = FastCollateMixup(mixup_alpha=0.8, cutmix_alpha=0.0, prob=1.0,
                            mode="elem", label_smoothing=0.0, num_classes=4,
                            seed=3)
    trng = twin._batch_rng([it[0] for it in items],
                           [it[1] for it in items])
    lam, use_cut = twin._params_per_elem(len(items), trng)
    assert not use_cut.any()
    batch, targets = mix(items)
    assert batch.dtype == np.uint8 and batch.shape == (8, 2, 16, 16, 3)
    for i in (0, 5):
        j = len(items) - 1 - i
        li = float(lam[i])
        want = (np.rint(items[i][0].astype(np.float32) * li
                        + items[j][0].astype(np.float32) * (1 - li))
                if li != 1.0 else items[i][0])
        np.testing.assert_array_equal(batch[i], want.astype(np.uint8))
    # soft targets: lam * y_i + (1-lam) * y_flip(i)
    want_t = host_mixup_target([it[1] for it in items], 4, lam[:, None], 0.0)
    np.testing.assert_allclose(targets, want_t, atol=1e-6)
    np.testing.assert_allclose(targets.sum(1), 1.0, atol=1e-5)


def test_batch_cutmix_pastes_one_shared_box():
    mix = FastCollateMixup(mixup_alpha=0.0, cutmix_alpha=1.0, prob=1.0,
                           mode="batch", label_smoothing=0.0, num_classes=4,
                           seed=11)
    twin = FastCollateMixup(mixup_alpha=0.0, cutmix_alpha=1.0, prob=1.0,
                            mode="batch", label_smoothing=0.0, num_classes=4,
                            seed=11)
    items = _items(b=4)
    trng = twin._batch_rng([it[0] for it in items],
                           [it[1] for it in items])
    lam0, use_cut = twin._params_per_batch(trng)
    assert use_cut
    (yl, yh, xl, xh), lam = _cutmix_box_and_lam(
        trng, 16, 16, lam0, None, True)
    batch, targets = mix(items)
    for i in range(4):
        j = 3 - i
        want = items[i][0].copy()
        want[:, yl:yh, xl:xh] = items[j][0][:, yl:yh, xl:xh]
        np.testing.assert_array_equal(batch[i], want)
    # corrected lam from the actual box area feeds the targets
    np.testing.assert_allclose(
        targets, host_mixup_target([it[1] for it in items], 4, lam, 0.0),
        atol=1e-6)


def test_half_mode_emits_half_batch():
    mix = FastCollateMixup(mixup_alpha=0.8, cutmix_alpha=0.0, prob=1.0,
                           mode="half", label_smoothing=0.0, num_classes=4,
                           seed=5)
    batch, targets = mix(_items(b=8))
    assert batch.shape[0] == 4 and targets.shape == (4, 4)


def test_pair_mode_swaps_patches_symmetrically():
    mix = FastCollateMixup(mixup_alpha=0.0, cutmix_alpha=1.0, prob=1.0,
                           mode="pair", label_smoothing=0.0, num_classes=4,
                           seed=7)
    items = _items(b=6)
    batch, targets = mix(items)
    # cutmix pair swap preserves the multiset of pixels of each (i, j) pair
    for i in range(3):
        j = 5 - i
        got = np.sort(np.stack([batch[i], batch[j]]).ravel())
        want = np.sort(np.stack([items[i][0], items[j][0]]).ravel())
        np.testing.assert_array_equal(got, want)
    # lam vector is mirrored: targets of i and j use lam and (1-lam) roles
    np.testing.assert_allclose(targets.sum(1), 1.0, atol=1e-5)


def test_smoothing_and_odd_batch_guard():
    mix = FastCollateMixup(mixup_alpha=0.8, mode="elem", num_classes=10,
                           label_smoothing=0.2, seed=0)
    batch, targets = mix(_items(b=4))
    np.testing.assert_allclose(targets.sum(1), 1.0, atol=1e-5)
    with pytest.raises(AssertionError):
        mix(_items(b=3))


def test_prob_zero_is_identity_with_hard_targets():
    mix = FastCollateMixup(mixup_alpha=0.8, mode="elem", prob=0.0,
                           label_smoothing=0.0, num_classes=4, seed=9)
    items = _items(b=4)
    batch, targets = mix(items)
    for i in range(4):
        np.testing.assert_array_equal(batch[i], items[i][0])
    np.testing.assert_array_equal(targets.argmax(1),
                                  [it[1] for it in items])
    np.testing.assert_allclose(targets.max(1), 1.0)


def test_minmax_boxes_force_cutmix_and_fit():
    mix = FastCollateMixup(mixup_alpha=0.0, cutmix_minmax=[0.25, 0.75],
                           mode="elem", prob=1.0, label_smoothing=0.0,
                           num_classes=4, seed=13)
    items = _items(b=8, h=32, w=32)
    batch, targets = mix(items)
    assert batch.shape == (8, 2, 32, 32, 3)
    # every mixed row is a pure paste: pixels come from clip i or clip j
    for i in range(8):
        j = 7 - i
        from_i = batch[i] == items[i][0]
        from_j = batch[i] == items[j][0]
        assert np.all(from_i | from_j)


def test_batch_rng_is_order_and_worker_independent():
    """Mixup draws are a pure function of (seed, batch content): collation
    happens inside pool workers (threads interleave; forked processes
    inherit identical rng copies), so a mutable shared generator would
    make draws depend on scheduling. Collating the same batches in any
    order, on any instance, must be bitwise identical."""
    a = _items(b=4, seed=0)
    b = _items(b=4, seed=1)
    m1 = FastCollateMixup(mixup_alpha=0.8, mode="elem", num_classes=4,
                          label_smoothing=0.0, seed=2)
    m2 = FastCollateMixup(mixup_alpha=0.8, mode="elem", num_classes=4,
                          label_smoothing=0.0, seed=2)
    xa1, ya1 = m1(a)
    xb1, yb1 = m1(b)
    xb2, yb2 = m2(b)  # different instance, different call order
    xa2, ya2 = m2(a)
    np.testing.assert_array_equal(xa1, xa2)
    np.testing.assert_array_equal(xb1, xb2)
    np.testing.assert_allclose(ya1, ya2)
    np.testing.assert_allclose(yb1, yb2)
    # and a different seed still changes the draw
    m3 = FastCollateMixup(mixup_alpha=0.8, mode="elem", num_classes=4,
                          label_smoothing=0.0, seed=3)
    assert not np.array_equal(m3(a)[0], xa1)


def test_loader_integration():
    """FastCollateMixup plugs into DataLoader as collate_fn."""
    from unite_tpu.data.loader import DataLoader

    class _DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            return rng.integers(0, 256, (2, 16, 16, 3), np.uint8), i % 4

    mix = FastCollateMixup(mixup_alpha=0.8, mode="batch", num_classes=4,
                           label_smoothing=0.1, seed=1)
    dl = DataLoader(_DS(), batch_size=4, shuffle=False, num_workers=0,
                    collate_fn=mix)
    batches = list(iter(dl))
    assert len(batches) == 2
    x, y = batches[0]
    assert x.dtype == np.uint8 and x.shape == (4, 2, 16, 16, 3)
    assert y.shape == (4, 4)
