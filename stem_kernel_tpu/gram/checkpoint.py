"""Tile-granular Gram-matrix checkpointing.

The reference has no in-run checkpointing — a failed multi-hour MPI Gram run
restarts from zero (SURVEY.md §5).  Here every pair batch lands in a durable
memmap as soon as it is computed, with a completion bitmap alongside; resume
skips finished batches.  Files:

    <path>.values.npy   float32 memmap over the flattened upper triangle
    <path>.done.npy     per-batch completion flags
    <path>.meta.json    {n, batch_size} sanity check
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np


def features_fingerprint(features, extra=None) -> str:
    """Cheap content fingerprint of a feature-array mapping.

    Hashes every array's key, shape, dtype, and a 4096-element strided
    value sample — enough to distinguish different corpora that produce
    identically-shaped buckets, at negligible cost for GB-scale features.
    """
    h = hashlib.sha1()
    for mapping in (features, extra):
        if mapping is None:
            continue
        for key in sorted(mapping):
            arr = np.asarray(mapping[key])
            h.update(key.encode())
            h.update(str(arr.shape).encode())
            h.update(str(arr.dtype).encode())
            flat = arr.ravel()
            if flat.size:
                h.update(np.ascontiguousarray(
                    flat[:: max(1, flat.size // 4096)]).tobytes())
    return h.hexdigest()


class TileCheckpoint:
    def __init__(self, path: str, n: int, batch_size: int,
                 n_pairs: int | None = None, fingerprint: str | None = None):
        """``n_pairs`` defaults to the upper triangle n(n+1)/2; rectangular
        blocks (bucketed Gram cross-blocks, test rows) pass it explicitly.
        ``fingerprint`` (features_fingerprint of the corpus) is stored in the
        meta and checked on resume, so a checkpoint written for one corpus is
        rejected for another even when every block size matches."""
        self.path = path
        self.n = n
        self.batch_size = batch_size
        self.n_pairs = n * (n + 1) // 2 if n_pairs is None else n_pairs
        self.n_batches = -(-self.n_pairs // batch_size)
        meta_path = path + ".meta.json"
        values_path = path + ".values.npy"
        done_path = path + ".done.npy"
        if os.path.exists(meta_path):
            meta = json.load(open(meta_path))
            # pre-round-4 checkpoints lack n_pairs; their layout was always
            # the upper triangle, so fill the implied value before comparing
            meta.setdefault("n_pairs", meta.get("n", 0) * (meta.get("n", 0) + 1) // 2)
            # pre-round-5 checkpoints lack the content fingerprint; accept
            # them (legacy leniency) but never accept a MISMATCHED one.
            # A None fingerprint (direct inspection/tests) accepts any.
            meta.setdefault("fingerprint", fingerprint)
            if fingerprint is None:
                fingerprint = meta["fingerprint"]
            if meta != {"n": n, "batch_size": batch_size,
                        "n_pairs": self.n_pairs, "fingerprint": fingerprint}:
                raise ValueError(
                    f"checkpoint {path} was written for {meta}, "
                    f"not n={n} batch_size={batch_size} "
                    f"fingerprint={fingerprint}"
                )
            self.values = np.lib.format.open_memmap(values_path, mode="r+")
            self.done = np.lib.format.open_memmap(done_path, mode="r+")
        else:
            self.values = np.lib.format.open_memmap(
                values_path, mode="w+", dtype=np.float32, shape=(self.n_pairs,)
            )
            self.done = np.lib.format.open_memmap(
                done_path, mode="w+", dtype=np.bool_, shape=(self.n_batches,)
            )
            json.dump({"n": n, "batch_size": batch_size,
                       "n_pairs": self.n_pairs, "fingerprint": fingerprint},
                      open(meta_path, "w"))

    def is_done(self, batch_idx: int) -> bool:
        return bool(self.done[batch_idx])

    def load_batch(self, batch_idx: int) -> np.ndarray:
        lo = batch_idx * self.batch_size
        hi = min(lo + self.batch_size, self.n_pairs)
        return np.asarray(self.values[lo:hi])

    def store_batch(self, batch_idx: int, vals: np.ndarray) -> None:
        lo = batch_idx * self.batch_size
        hi = min(lo + self.batch_size, self.n_pairs)
        self.values[lo:hi] = vals[: hi - lo]
        self.values.flush()
        self.done[batch_idx] = True
        self.done.flush()

    @property
    def n_completed(self) -> int:
        return int(self.done.sum())

    def cleanup(self) -> None:
        for suffix in (".values.npy", ".done.npy", ".meta.json"):
            try:
                os.remove(self.path + suffix)
            except FileNotFoundError:
                pass
