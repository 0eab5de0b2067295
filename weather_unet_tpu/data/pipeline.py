"""Host->device input pipeline: threaded decode, batching, device prefetch.

Replaces torch DataLoader worker processes (``t_est_train.py:176-196``) with a
thread-pool decode feeding pinned numpy batches and an async device-put
prefetcher (double buffering into HBM) — the per-step H2D copy the reference
pays at ``t_est_train.py:381-382`` overlaps with compute here.
"""

from __future__ import annotations

import collections
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator, Optional, Sequence

import numpy as np


def _stack(samples):
    """Collate a list of per-sample tuples into a tuple of stacked arrays
    (non-array fields become object arrays, e.g. photo ids)."""
    fields = list(zip(*samples))
    out = []
    for f in fields:
        first = f[0]
        if isinstance(first, np.ndarray):
            out.append(np.stack(f))
        elif isinstance(first, (int, float, bool, np.integer, np.floating)):
            out.append(np.asarray(f))
        else:
            out.append(np.asarray(f, dtype=object))
    return tuple(out)


class BatchLoader:
    """Iterable over collated batches with threaded sample loading.

    Args mirror the reference DataLoader knobs: ``shuffle``, ``drop_last``,
    ``sampler`` (an iterable of indices, e.g. ``ImbalancedSampler``),
    ``num_workers`` (thread pool size).
    """

    def __init__(self, dataset, batch_size: int, *, shuffle: bool = False,
                 drop_last: bool = True, sampler: Optional[Iterable[int]] = None,
                 num_workers: int = 8, seed: int = 0,
                 process_shard: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.sampler = sampler
        self.num_workers = max(1, num_workers)
        self.process_shard = process_shard
        self.seed = seed
        self._rng = np.random.default_rng(seed)
        if process_shard and not drop_last:
            # Fail at construction, not at the epoch's LAST batch: a tail
            # batch whose row count doesn't divide the process count makes
            # process_slice raise after the whole epoch ran (review
            # finding, round 5).  The supervised CLIs therefore keep
            # drop_last=True in multi-process runs.
            import jax

            pc = jax.process_count()
            try:
                n = len(sampler) if sampler is not None else len(dataset)
            except TypeError:
                n = None              # unsized sampler: can't pre-check
            tail = (n % batch_size) if n is not None else 0
            if pc > 1 and tail and tail % pc:
                raise ValueError(
                    f"process_shard with drop_last=False: the tail batch "
                    f"({tail} rows) is not divisible by "
                    f"process_count={pc}, so the epoch would crash at its "
                    f"last batch — use drop_last=True (what the training "
                    f"CLIs do multi-process) or size the dataset")

    def set_epoch(self, epoch: int):
        """Deterministically reseed the shuffle for ``epoch``.

        The reference's torch DataLoader draws a fresh permutation every
        epoch (``t_est_train.py:176-196`` via RandomSampler); a loader
        rebuilt per epoch from a fixed ``seed`` would instead replay the
        SAME order.  The training loops call this before each epoch with
        the absolute epoch index, making the order a pure function of
        ``(seed, epoch)`` — identical across hosts (the multi-process
        ``process_shard`` contract) and reproducible under resume.
        Propagates to the ``sampler`` and to the dataset's ``transform``
        when they support ``set_epoch`` (the transform keys its per-path
        augmentation RNG streams on the epoch —
        ``transforms._KeyedRngMixin``).
        """
        self._rng = np.random.default_rng(
            np.random.SeedSequence((self.seed, epoch)))
        se = getattr(self.sampler, "set_epoch", None)
        if se is not None:
            se(epoch)
        se_t = getattr(getattr(self.dataset, "transform", None),
                       "set_epoch", None)
        if se_t is not None:
            se_t(epoch)

    def __len__(self):
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _indices(self):
        if self.sampler is not None:
            return list(iter(self.sampler))
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        return idx.tolist()

    def __iter__(self) -> Iterator[tuple]:
        indices = self._indices()
        bs = self.batch_size
        n_full = len(indices) // bs
        batches = [indices[i * bs:(i + 1) * bs] for i in range(n_full)]
        if not self.drop_last and len(indices) % bs:
            batches.append(indices[n_full * bs:])
        if self.process_shard:
            # Host-sharded input (SURVEY.md §2.9): under multi-process JAX
            # every host runs the SAME seeded index sequence (identical
            # ``seed``/sampler RNG across hosts is the caller's contract)
            # but loads only its global-batch rows; downstream,
            # ``device_prefetch(assembly='process_local')`` assembles the
            # global array from the per-host shards.  Single-process: no-op.
            import jax

            if jax.process_count() > 1:
                from weather_unet_tpu.parallel.launch import process_slice

                batches = [b[process_slice(len(b))] for b in batches]

        with ThreadPoolExecutor(self.num_workers) as pool:
            # pipeline: submit the next batch's samples while yielding current
            pending = collections.deque()
            for b in batches[:2]:
                pending.append([pool.submit(self.dataset.__getitem__, i) for i in b])
            k = 2
            while pending:
                futs = pending.popleft()
                if k < len(batches):
                    pending.append(
                        [pool.submit(self.dataset.__getitem__, i) for i in batches[k]])
                    k += 1
                yield _stack([f.result() for f in futs])


def assemble_global_batch(sharding, local: np.ndarray):
    """Build a globally-sharded ``jax.Array`` from this process's LOCAL batch.

    The multi-host input seam (SURVEY.md §2.9 'host-sharded input pipeline
    feeding per-device batches'): under multi-process JAX each host loads
    only its slice of the global batch and
    ``jax.make_array_from_process_local_data`` assembles the DCN-spanning
    global array without any host ever materializing the full batch.  On a
    single process the result is value-identical to
    ``jax.device_put(local, sharding)`` (tests/test_data.py pins this), so
    the same code path serves both scales.
    """
    import jax

    return jax.make_array_from_process_local_data(sharding, local)


def device_prefetch(iterator: Iterable, sharding=None, depth: int = 2,
                    device_fields: Optional[Sequence[int]] = None,
                    assembly: str = "auto"):
    """Asynchronously device_put batches ``depth`` steps ahead.

    ``device_fields`` selects which tuple fields go to device (object-dtype
    fields like photo ids stay on host).

    ``assembly`` picks how a sharded global array is built from the host
    batch: ``"global"`` treats the batch as the full global batch on every
    process (single-host ``device_put``); ``"process_local"`` treats it as
    this process's shard and assembles via
    :func:`assemble_global_batch`; ``"auto"`` selects ``process_local`` iff
    ``jax.process_count() > 1``.
    """
    import jax

    if assembly not in ("auto", "global", "process_local"):
        raise ValueError(f"unknown assembly mode {assembly!r}")
    process_local = (assembly == "process_local" or
                     (assembly == "auto" and jax.process_count() > 1))

    def put(batch):
        out = []
        for i, x in enumerate(batch):
            on_device = (device_fields is None or i in device_fields)
            if on_device and isinstance(x, np.ndarray) and x.dtype != object:
                if sharding is None:
                    out.append(jax.device_put(x))
                elif process_local:
                    out.append(assemble_global_batch(sharding, x))
                else:
                    out.append(jax.device_put(x, sharding))
            else:
                out.append(x)
        return tuple(out)

    queue: collections.deque = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(depth):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        nxt = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield nxt
