"""MNIST data pipeline: fetch-on-miss cache of the four IDX files, with a
deterministic synthetic fallback for offline environments.

Mirrors the reference's loader (``loadData``, ``app/MNIST.hs:159-192``):
look for the uncompressed IDX files in the data dir; on miss, download the
``.gz`` from the MNIST mirror, decompress, and write back to the cache.
The rebuild adds: if the network is unreachable (this framework targets
hermetic TPU pods), generate a clearly-labeled *synthetic* pseudo-MNIST —
class-conditional noisy prototypes — so the end-to-end app and tests run
anywhere.
"""

from __future__ import annotations

import gzip
import os
from typing import List, Tuple
from urllib.request import urlopen

import numpy as np

from .idx import decode_idx, encode_idx, labeled_data

MNIST_BASE = "https://ossci-datasets.s3.amazonaws.com/mnist"  # lecun mirror
MNIST_FILES = [
    ("train-images-idx3-ubyte", "train-labels-idx1-ubyte"),
    ("t10k-images-idx3-ubyte", "t10k-labels-idx1-ubyte"),
]

Sample = Tuple[int, np.ndarray]


def _fetch(url: str, timeout: float = 20.0) -> bytes:
    with urlopen(url, timeout=timeout) as r:  # noqa: S310
        return r.read()


def _synthesize(n_train: int = 6000, n_test: int = 1000, seed: int = 1234):
    """Deterministic pseudo-MNIST: per-class smooth random prototypes in
    [0,1]^784 plus noise — linearly separable enough to validate training
    end-to-end, clearly not real digits."""
    rng = np.random.default_rng(seed)
    protos = rng.uniform(0.0, 1.0, size=(10, 784))
    # smooth the prototypes a little so /255-style stats look image-like
    protos = (protos + np.roll(protos, 1, axis=1) + np.roll(protos, -1, axis=1)) / 3.0

    def make(n, rng):
        labels = rng.integers(0, 10, size=n)
        imgs = np.clip(
            protos[labels] * 0.8 + rng.normal(0, 0.15, size=(n, 784)), 0.0, 1.0
        )
        return labels.astype(np.uint8), (imgs * 255).astype(np.uint8).reshape(n, 28, 28)

    tr = make(n_train, np.random.default_rng(seed + 1))
    te = make(n_test, np.random.default_rng(seed + 2))
    return tr, te


def load_mnist(data_dir: str, allow_synthetic: bool = True) -> List[List[Sample]]:
    """Return ``[train_samples, test_samples]`` as ``[(label, pixels)]``
    with uint8 pixel vectors of length 784."""
    os.makedirs(data_dir, exist_ok=True)
    print(f"Loading data from {data_dir}")
    out: List[List[Sample]] = []
    try:
        for img_name, lbl_name in MNIST_FILES:
            arrays = []
            for name in (img_name, lbl_name):
                path = os.path.join(data_dir, name)
                raw = None
                if os.path.exists(path):
                    with open(path, "rb") as f:
                        raw = f.read()
                    try:
                        arrays.append(decode_idx(raw))
                        continue
                    except ValueError:
                        # corrupt/truncated cache (e.g. killed mid-write):
                        # discard and fall through to re-acquire
                        print(f"cached '{name}' is corrupt; refetching")
                        os.remove(path)
                        raw = None
                if raw is None and os.path.exists(path + ".gz"):
                    # user-provided compressed files (airgapped hosts)
                    with open(path + ".gz", "rb") as f:
                        raw = gzip.decompress(f.read())
                if raw is None:
                    print(f"'{name}' not found; downloading from {MNIST_BASE} ...")
                    raw = gzip.decompress(_fetch(f"{MNIST_BASE}/{name}.gz"))
                arr = decode_idx(raw)  # validate before caching
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(raw)
                os.replace(tmp, path)  # atomic: no truncated cache files
                arrays.append(arr)
            images, labels = arrays
            out.append(labeled_data(labels, images))
        return out
    except Exception as e:  # zero-egress or corrupt cache
        if not allow_synthetic:
            raise
        print(f"Could not load real MNIST ({type(e).__name__}: {e}).")
        print("Falling back to SYNTHETIC pseudo-MNIST (deterministic, offline).")
        (trl, tri), (tel, tei) = _synthesize()
        # cache the synthetic set in IDX format so reruns are stable
        for (lbl, img), (img_name, lbl_name) in zip(
            [(trl, tri), (tel, tei)], MNIST_FILES
        ):
            with open(os.path.join(data_dir, img_name + ".synthetic"), "wb") as f:
                f.write(encode_idx(img))
            with open(os.path.join(data_dir, lbl_name + ".synthetic"), "wb") as f:
                f.write(encode_idx(lbl))
        return [labeled_data(trl, tri), labeled_data(tel, tei)]
