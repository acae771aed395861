"""Device-resident dataset cache: upload once, train from HBM.

The reference re-transfers every batch to the accelerator on every epoch
(`models/wrapper.py:54` runs inside the epoch loop), so its steady-state
training throughput is bounded by host→device bandwidth even though the
datasets here are tiny relative to accelerator memory (the full flagship
point-cloud split is tens of MB; a v5e chip has 16 GB of HBM).

``ResidentCache`` wraps any re-iterable batch loader.  The first iteration
streams batches from the underlying loader, places each on device (with the
mesh shardings when training is distributed), and keeps the device
references.  Every later iteration replays the cached device batches —
zero host→device traffic after epoch one, which also makes throughput
independent of transport health on tunneled TPU backends.

Exactness: the cached arrays are byte-identical to what the streaming path
would have transferred (``device_put`` of the same host buffers), so
training with the cache reproduces streaming training bit-for-bit when the
replay order matches.  By default the epoch-one batch order is replayed
every epoch; pass ``shuffle_seed`` to permute the *order of batches* across
epochs (batch composition stays fixed after epoch one — the standard
trade of cached input pipelines).

Memory safety: caching stops at ``budget_bytes`` (default 2 GiB, override
via ``PCC_RESIDENT_BUDGET_MB``).  If the budget trips mid-epoch the cache
abandons itself and every iteration — current and future — streams from the
underlying loader unchanged, so oversized datasets degrade to exactly the
old behavior instead of an OOM.

Upload batching: the first pass groups consecutive same-shape batches into
chunks (``upload_chunk`` batches, ≤ ``_CHUNK_BYTES_CAP``), host-stacks each
chunk with ``np.stack``, ships it as ONE ``device_put``, and splits it back
into per-batch device arrays with one jitted slice program per chunk.  Same
bytes, ~``upload_chunk``× fewer host→device transfers and dispatches — on
tunneled TPU backends each small transfer can stall tens of ms (measured
3.8 s/step first-epoch upload in a degraded window vs 66 ms/step for the
stream pipeline's already-chunked transfers), so per-batch ``device_put``
was the resident pipeline's cold-start bottleneck.  Under a mesh the
per-batch ``shard_batch`` path is kept (a stacked [K, ...] chunk would need
axis-1 shardings, and multi-host meshes don't ride the tunnel).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Iterable, Iterator, List, Optional

import jax
import numpy as np

_CHUNK_BYTES_CAP = 128 << 20  # transient stack+split ≤ 2× this per chunk


def _default_budget_bytes() -> int:
    mb = os.environ.get("PCC_RESIDENT_BUDGET_MB")
    return int(mb) * (1 << 20) if mb else 2 << 30


def _default_upload_chunk() -> int:
    return max(1, int(os.environ.get("PCC_RESIDENT_UPLOAD_CHUNK", "64")))


def _nbytes(batch: Dict[str, np.ndarray]) -> int:
    return int(sum(np.asarray(v).nbytes for v in batch.values()))


def _shape_key(batch: Dict[str, np.ndarray]):
    # NOTE: models/wrapper.py carries its own _shape_key with a different
    # dtype encoding (str(dtype) vs dtype.str); the two key INDEPENDENT
    # caches and must never be compared across modules
    return tuple(
        (k, np.asarray(v).shape, np.asarray(v).dtype.str)
        for k, v in sorted(batch.items())
    )


@functools.lru_cache(maxsize=None)
def _split_fn(k: int):
    """One program that turns a [K, ...]-stacked batch dict into K batch
    dicts — a single dispatch instead of K×len(keys) eager slices (each
    eager dispatch costs real time on remote TPU transports)."""
    return jax.jit(
        lambda stacked: tuple(
            {key: leaf[i] for key, leaf in stacked.items()} for i in range(k)
        )
    )


class ResidentCache:
    """Re-iterable wrapper that pins a loader's batches in device memory."""

    def __init__(
        self,
        loader: Iterable[Dict[str, np.ndarray]],
        mesh=None,
        budget_bytes: Optional[int] = None,
        shuffle_seed: Optional[int] = None,
        epoch_offset: int = 0,
        upload_chunk: Optional[int] = None,
        shuffle_block: int = 1,
    ):
        self.loader = loader
        self.budget_bytes = (
            _default_budget_bytes() if budget_bytes is None else budget_bytes
        )
        # stacked-upload only off-mesh: shard_batch shards per-batch leading
        # dims, which a [K, ...] stack would misplace onto the data axis
        self.upload_chunk = (
            (_default_upload_chunk() if upload_chunk is None else max(1, upload_chunk))
            if mesh is None
            else 1
        )
        self.shuffle_seed = shuffle_seed
        # shuffle granularity: permute BLOCKS of `shuffle_block` consecutive
        # cached batches (intra-block order fixed, a partial tail block
        # stays last).  The fused trainer passes its fuse depth here so the
        # composition of each fuse window is stable across epochs and the
        # memoized pre-stacked windows (`ModelWrapper._prestack_window`)
        # keep hitting — batch-level shuffle recomposed every window and
        # forced the in-jit tuple re-stack (9% of the flagship step) every
        # flush.  One more level of the standard cached-pipeline trade
        # (composition freezes, order stays stochastic); block=1 is the
        # old per-batch shuffle.  Training-quality cost measured ~zero
        # (2026-08-21, FCN on synthetic s2pt, 30 batches, 40 epochs, 5
        # seeds: window-shuffle val acc 0.9769 ± 0.0032 vs batch-shuffle
        # 0.9775 ± 0.0036 — identical within noise).
        self.shuffle_block = max(1, int(shuffle_block))
        # epoch_offset seeds the shuffle counter for RESUMED training: a
        # cache restarted at 0 would replay the batch orders the crashed
        # run already consumed (the trainer passes its start epoch).
        # Caveat (round-5 review): the resumed cache's FIRST epoch is a
        # streaming pin pass, so it yields the underlying loader's order,
        # not permutation(seed + start_epoch + 1) — the uninterrupted
        # run's order for that one epoch differs; replay epochs from the
        # second onward align exactly.  Accepted: shuffling is impossible
        # while batch identity is still being pinned, and a one-epoch
        # order difference is the same class of divergence as the
        # fresh-run first pass itself (also streamed, also unshuffled)
        self._epoch = int(epoch_offset)
        self._cached: Optional[list] = None  # device batches once complete
        self._abandoned = False
        if mesh is not None:
            from point_cloud_classifier_tpu.parallel.mesh import shard_batch

            self._put = lambda b: shard_batch(mesh, b)
            # streaming yields (budget abandonment) need the same
            # data-axis placement as the pinned path under a mesh
            self._put_stream = self._put
        else:
            self._put = lambda b: {k: jax.device_put(v) for k, v in b.items()}
            # ... but OFF-mesh, streaming yields hand HOST batches to the
            # consumer unmodified: jit's pipelined argument transfer is
            # the measured-fastest path on this backend, and an eager
            # per-leaf device_put per batch forever (the old behavior)
            # made oversized datasets train SLOWER than never wrapping
            # the loader at all (round-5 review finding).  Pinned-cache
            # uploads keep the eager _put — pinning is the point there.
            self._put_stream = lambda b: b

    @property
    def cached(self) -> bool:
        return self._cached is not None

    def _replay_block(self) -> int:
        """Effective shuffle granularity for replay epochs.

        Window-granular shuffle needs enough blocks to actually shuffle:
        with fewer than 8 full blocks the permutation space collapses
        toward degeneracy (3 blocks → 3! = 6 epoch orders with frozen
        intra-window order; 1 block → the IDENTITY order every epoch —
        exactly the silent-repeat failure ``shuffle_seed`` exists to
        prevent, found in the round-4 review on small datasets where
        fuse_steps ≥ n/2).  The zero-quality-cost A/B backing the
        window-granular default was measured at ~15 blocks (see __init__
        comment); the round-4 advisor flagged that it says nothing near
        the 3-block floor, so the fallback threshold is 8 full blocks
        (8! ≈ 40k orders — comfortably more epoch orders than any
        realistic epoch count consumes).  Below that threshold replay
        falls back to batch-level shuffle: SGD stochasticity wins over
        the fuse-window memo, whose consumer checks
        ``replay_is_window_stable`` and uses the in-jit tuple stack
        instead.
        """
        if self.shuffle_seed is None or self.shuffle_block <= 1:
            return 1
        n = len(self._cached) if self._cached is not None else 0
        return self.shuffle_block if n // self.shuffle_block >= 8 else 1

    def replay_is_window_stable(self, k: int) -> bool:
        """True when replay epochs keep every k-sized fuse window's
        COMPOSITION fixed (only window order varies) — the invariant the
        trainer's memoized pre-stacked windows rely on
        (``ModelWrapper._prestack_window``).  False while the first pass
        is still streaming (window identity unknown until pinned), after
        a budget abandonment, or when replay shuffles at batch
        granularity."""
        if self._cached is None or self._abandoned:
            return False
        if self.shuffle_seed is None:
            return True
        return k > 1 and self._replay_block() == k

    def __iter__(self) -> Iterator[Dict[str, jax.Array]]:
        self._epoch += 1
        if self._abandoned:
            # still place each batch (mesh shardings / device_put): the
            # oversized-dataset fallback must match the streaming pipeline's
            # placement, not silently skip data-axis sharding under a mesh
            for batch in self.loader:
                yield self._put_stream(batch)
            return
        if self._cached is not None:
            n = len(self._cached)
            order = range(n)
            if self.shuffle_seed is not None:
                rng = np.random.default_rng(self.shuffle_seed + self._epoch)
                blk = self._replay_block()
                if blk <= 1:
                    order = rng.permutation(n)
                else:
                    # permute full blocks only; the partial tail block (if
                    # any) stays LAST so the trainer's fuse windows remain
                    # aligned with block boundaries (a mid-epoch short
                    # window would recompose every window after it)
                    n_full = (n // blk) * blk
                    starts = rng.permutation(n // blk) * blk
                    order = np.concatenate(
                        [
                            (starts[:, None] + np.arange(blk)).reshape(-1),
                            np.arange(n_full, n),
                        ]
                    )
            for i in order:
                yield self._cached[i]
            return
        # first pass: stream, place (chunk-stacked off-mesh), and pin
        pinned, used = [], 0
        chunk: List[Dict[str, np.ndarray]] = []  # same-shape host batches
        chunk_key, chunk_bytes = None, 0
        it = iter(self.loader)

        def upload_chunk():
            if len(chunk) == 1:
                devs = [self._put(chunk[0])]
            else:
                stacked = jax.device_put(
                    {k: np.stack([b[k] for b in chunk]) for k in chunk[0]}
                )
                devs = list(_split_fn(len(chunk))(stacked))
            chunk.clear()
            pinned.extend(devs)
            return devs

        for batch in it:
            nbytes = _nbytes(batch)
            used += nbytes
            if used > self.budget_bytes:
                # over budget: give up on caching entirely and fall back to
                # pure streaming (any chunked-but-unshipped batches, this
                # batch, and the rest of the epoch straight from the loader;
                # later epochs too)
                self._abandoned = True
                pinned.clear()
                for held in chunk:
                    yield self._put_stream(held)
                chunk.clear()
                yield self._put_stream(batch)
                for rest in it:
                    yield self._put_stream(rest)
                return
            key = _shape_key(batch) if self.upload_chunk > 1 else None
            if chunk and (
                len(chunk) >= self.upload_chunk
                or key != chunk_key
                or chunk_bytes >= _CHUNK_BYTES_CAP
            ):
                yield from upload_chunk()
                chunk_bytes = 0
            chunk_key = key
            chunk_bytes += nbytes
            chunk.append(batch)
        if chunk:
            yield from upload_chunk()
        self._cached = pinned
