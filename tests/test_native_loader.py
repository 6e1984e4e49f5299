"""Native (C++) data-plane tests: compile via g++, compare against numpy."""

import numpy as np
import pytest

from qat_vit_tpu.data.native_loader import (
    decode_cifar_bin,
    gather_batch,
    load_native,
    native_available,
    shuffle_indices,
)


@pytest.fixture(scope="module")
def lib():
    lib = load_native()
    if lib is None:
        pytest.skip("g++/native build unavailable")
    return lib


class TestNativeDecode:
    def test_decode_matches_numpy(self, lib):
        rng = np.random.default_rng(0)
        n = 17
        raw = rng.integers(0, 256, n * 3073, dtype=np.uint8)
        imgs, labels = decode_cifar_bin(raw)
        rec = raw.reshape(n, 3073)
        exp_labels = rec[:, 0].astype(np.int32)
        exp_imgs = rec[:, 1:].reshape(n, 3, 32, 32).transpose(0, 2, 3, 1)
        np.testing.assert_array_equal(labels, exp_labels)
        np.testing.assert_array_equal(imgs, exp_imgs)

    def test_gather_matches_numpy(self, lib):
        rng = np.random.default_rng(1)
        images = rng.integers(0, 256, (100, 32, 32, 3), dtype=np.uint8)
        labels = rng.integers(0, 10, 100).astype(np.int32)
        idx = rng.permutation(100)[:32].astype(np.int64)
        img, lab = gather_batch(images, labels, idx)
        np.testing.assert_array_equal(img, images[idx])
        np.testing.assert_array_equal(lab, labels[idx])

    def test_shuffle_is_permutation_and_deterministic(self, lib):
        a = shuffle_indices(1000, seed=42)
        b = shuffle_indices(1000, seed=42)
        c = shuffle_indices(1000, seed=43)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)
        np.testing.assert_array_equal(np.sort(a), np.arange(1000))

    def test_loader_uses_native_path(self, lib):
        """ArrayLoader batches must be identical whether or not the native
        gather is active (it is, since lib loaded)."""
        from qat_vit_tpu.data import ArrayLoader, synthetic_cifar10

        data = synthetic_cifar10(n_train=64, n_test=8, seed=0)
        loader = ArrayLoader(data["train_images"], data["train_labels"],
                             batch_size=16, shuffle=True, seed=3, prefetch=0)
        loader.set_epoch(2)
        batches = list(loader)
        # reference: pure-numpy gather with the same indices
        from qat_vit_tpu.data.pipeline import epoch_indices

        idx = epoch_indices(64, epoch=2, seed=3)
        np.testing.assert_array_equal(
            batches[0]["image"], data["train_images"][idx[:16]]
        )
        np.testing.assert_array_equal(
            batches[0]["label"], data["train_labels"][idx[:16]]
        )

    def test_bin_dir_roundtrip_native(self, lib, tmp_path):
        """Write the real .bin on-disk format; native decode must read it."""
        from qat_vit_tpu.data import load_cifar10

        d = tmp_path / "cifar-10-batches-bin"
        d.mkdir()
        rng = np.random.default_rng(2)
        all_imgs, all_labels = [], []
        for i in range(1, 6):
            rec = np.zeros((10, 3073), np.uint8)
            labels = rng.integers(0, 10, 10).astype(np.uint8)
            imgs = rng.integers(0, 256, (10, 3, 32, 32), dtype=np.uint8)
            rec[:, 0] = labels
            rec[:, 1:] = imgs.reshape(10, -1)
            rec.tofile(d / f"data_batch_{i}.bin")
            all_imgs.append(imgs)
            all_labels.append(labels)
        rec.tofile(d / "test_batch.bin")
        data, source = load_cifar10(str(tmp_path))
        assert source == "bin"
        exp = np.concatenate(all_imgs).transpose(0, 2, 3, 1)
        np.testing.assert_array_equal(data["train_images"], exp)
        np.testing.assert_array_equal(
            data["train_labels"], np.concatenate(all_labels).astype(np.int32)
        )


def test_numpy_fallback_paths(monkeypatch):
    """With the native lib forcibly absent, every entry point still works."""
    import qat_vit_tpu.data.native_loader as nl

    monkeypatch.setattr(nl, "_LIB", None)
    monkeypatch.setattr(nl, "_TRIED", True)
    raw = np.random.default_rng(0).integers(0, 256, 3 * 3073, dtype=np.uint8)
    imgs, labels = nl.decode_cifar_bin(raw)
    assert imgs.shape == (3, 32, 32, 3)
    images = np.zeros((10, 2, 2, 3), np.uint8)
    lab = np.arange(10, dtype=np.int32)
    img, lb = nl.gather_batch(images, lab, np.array([1, 3]))
    assert img.shape == (2, 2, 2, 3) and list(lb) == [1, 3]
    p = nl.shuffle_indices(50, 0)
    np.testing.assert_array_equal(np.sort(p), np.arange(50))
