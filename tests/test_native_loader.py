"""Native (C++) batch producer tests — behavioral contract, both backends."""

import numpy as np
import pytest

from igdm_tpu.data.native_loader import NativeBatcher, native_available


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(0)
    # give every image a unique fingerprint via its [0,0,0] pixel
    x = rng.standard_normal((37, 8, 8, 1)).astype(np.float32)
    x[:, 0, 0, 0] = np.arange(37, dtype=np.float32)
    return x


def test_native_library_builds():
    assert native_available(), "g++ build of native/batcher.cpp failed"


@pytest.mark.parametrize("force_fallback", [False, True])
def test_epoch_is_a_permutation(imgs, force_fallback, monkeypatch):
    if force_fallback:
        monkeypatch.setattr(
            "igdm_tpu.data.native_loader.load_library", lambda: None
        )
    b = NativeBatcher(imgs, batch_size=10, seed=1)
    seen = []
    for _ in range(4):  # 10+10+10+7 = one epoch
        batch = b.next()
        seen.extend(batch[:, 0, 0, 0].astype(int).tolist())
    assert len(seen) == 37
    assert sorted(seen) == list(range(37))  # every image exactly once
    # second epoch: again a permutation, different order (overwhelmingly)
    seen2 = []
    for _ in range(4):
        seen2.extend(b.next()[:, 0, 0, 0].astype(int).tolist())
    assert sorted(seen2) == list(range(37))
    b.close()


def test_drop_remainder(imgs):
    b = NativeBatcher(imgs, batch_size=10, seed=2, drop_remainder=True)
    for _ in range(8):
        assert b.next().shape[0] == 10
    b.close()


def test_batches_match_source_images(imgs):
    b = NativeBatcher(imgs, batch_size=5, seed=3)
    batch = b.next()
    for row in batch:
        idx = int(row[0, 0, 0])
        np.testing.assert_array_equal(row, imgs[idx])
    b.close()


def test_flip_augmentation(imgs):
    b = NativeBatcher(imgs, batch_size=37, seed=4, augment_flip=True)
    batch = b.next()
    flipped = unflipped = 0
    for row in batch:
        # fingerprint pixel moved to the right edge if flipped
        if any(np.array_equal(row, imgs[i]) for i in range(37)):
            unflipped += 1
        else:
            idx = int(row[0, -1, 0])
            np.testing.assert_array_equal(row, imgs[idx, :, ::-1, :])
            flipped += 1
    assert flipped > 5 and unflipped > 5  # ~50/50 coin
    b.close()


def test_prefetch_keeps_up(imgs):
    if not native_available():
        pytest.skip("native lib unavailable")
    b = NativeBatcher(imgs, batch_size=8, seed=5)
    total = 0
    for _ in range(200):  # many epochs through the ring
        total += b.next().shape[0]
    assert total == sum(
        8 if i % 5 < 4 else 5 for i in range(200)
    )  # 37 = 8+8+8+8+5 per epoch
    b.close()
