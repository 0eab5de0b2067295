"""DecodedCache / CachedAugment: decode-once-augment-every-epoch pipeline."""

import numpy as np
import pytest

from weather_unet_tpu.data.cache import CachedAugment, DecodedCache


@pytest.fixture()
def jpegs(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        p = tmp_path / f"{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (64, 80, 3), np.uint8)).save(
            p, quality=92)
        paths.append(str(p))
    return paths


def test_cache_fills_lazily_and_hits(tmp_path, jpegs):
    c = DecodedCache(str(tmp_path / "c"), base_size=32, paths=jpegs)
    a = c.get(jpegs[0])
    assert a.shape == (32, 32, 3) and a.dtype == np.uint8
    assert (c.hits, c.misses) == (0, 1)
    b = c.get(jpegs[0])
    np.testing.assert_array_equal(a, b)
    assert (c.hits, c.misses) == (1, 1)


def test_cache_stale_row_invalidation_bumps_gen(tmp_path, jpegs):
    """A reopen that finds a source file changed clears the row's present
    flag AND bumps its gen counter — the torn-read guard other live
    readers validate against (review finding, round 5)."""
    import os
    import time

    d = str(tmp_path / "c")
    c1 = DecodedCache(d, base_size=32, paths=jpegs)
    c1.populate()
    row = c1._rows[os.path.abspath(jpegs[2])]
    assert int(c1.gen[row]) == 0
    # rewrite the source (content + mtime change)
    from PIL import Image

    time.sleep(0.01)
    Image.fromarray(np.zeros((64, 80, 3), np.uint8)).save(jpegs[2], quality=92)
    c2 = DecodedCache(d, base_size=32, paths=jpegs)
    assert c2._rows[os.path.abspath(jpegs[2])] == row
    assert int(c2.present[row]) == 0 and int(c2.gen[row]) == 1
    # c1 shares the inode: its next read of the invalidated row must NOT
    # serve the old cached bytes
    fresh = c1.get(jpegs[2])
    assert fresh.mean() < 1.0           # the rewritten all-zero image
    # untouched rows unaffected
    assert int(c2.gen[(row + 1) % len(jpegs)]) == 0


def test_cache_get_rejects_torn_read(tmp_path, jpegs):
    """get()'s seqlock recheck: when an invalidation lands between the
    pixel copy and the validation, the copy is discarded and the SOURCE is
    served (it can never return half-old/half-new cache bytes)."""
    import os

    d = str(tmp_path / "c")
    c = DecodedCache(d, base_size=32, paths=jpegs)
    c.populate()
    row = c._rows[os.path.abspath(jpegs[0])]
    true_img = np.array(c.data[row])

    class InvalidateOnRead:
        """Simulates a concurrent process invalidating + refilling the row
        exactly while our copy is in flight."""

        def __init__(self, data):
            self._data = data

        def __getitem__(self, i):
            view = self._data[i]
            if i == row:                # the interleaved invalidator
                c.present[row] = 0
                c.gen[row] += 1
                self._data[i] = 0       # torn/NEW bytes land in the row
                c.present[row] = 1
            return view

        def __setitem__(self, i, v):
            self._data[i] = v

    c.data = InvalidateOnRead(c.data)
    out = c.get(jpegs[0])
    # served from the SOURCE file, which still decodes to the true image
    np.testing.assert_array_equal(out, true_img)


def test_cache_row_reassignment_never_serves_wrong_image(tmp_path, jpegs):
    """A live cache object must NEVER serve another path's pixels after a
    later reopen reassigns its row to a different path (changed corpus) —
    gen alone cannot catch this (the bump precedes the late reader's
    snapshot and the new fill looks stable); owner.npy's per-row path hash
    does (review finding, round 5, previously reproduced as a wrong-image
    HIT)."""
    import os

    from PIL import Image

    d = str(tmp_path / "c")
    a, b = jpegs[0], jpegs[1]
    c = str(tmp_path / "c_img.jpg")
    Image.fromarray(np.full((64, 80, 3), 30, np.uint8)).save(c, quality=92)

    p1 = DecodedCache(d, base_size=32, paths=[a, b])
    p1.populate()
    true_b = p1.get(b)
    row_b = p1._rows[os.path.abspath(b)]

    p2 = DecodedCache(d, base_size=32, paths=[a, c])   # b dropped, c new
    assert p2._rows[os.path.abspath(c)] == row_b       # row reassigned
    c_img = p2.get(c)                                  # fills with c pixels
    assert int(p2.present[row_b]) == 1

    got = p1.get(b)                      # stale mapping b -> row_b
    np.testing.assert_array_equal(got, true_b)          # b's REAL pixels
    assert not np.array_equal(got, c_img)
    assert p1.hits == 1                  # only the pre-reassignment read


def test_cached_augment_keyed_and_png_routing(tmp_path, jpegs):
    """CachedAugment exposes the keyed-RNG seam and routes ANY extension
    through the cache (from_path_any): a .png corpus member must hit the
    decode cache and draw from the schedule-independent keyed stream
    (review finding, round 5: pngs bypassed both)."""
    from PIL import Image

    from weather_unet_tpu.data.datasets import ImagePathDataset
    from weather_unet_tpu.data.transforms import NativeAugment

    png = str(tmp_path / "x.png")
    rng = np.random.default_rng(1)
    Image.fromarray(rng.integers(0, 255, (64, 80, 3), np.uint8)).save(png)
    paths = jpegs[:2] + [png]
    cache = DecodedCache(str(tmp_path / "c"), base_size=48, paths=paths)
    aug = CachedAugment(cache, NativeAugment(32, seed=5))
    assert getattr(aug, "from_path_any", False)
    ds = ImagePathDataset(paths, out_size=48, transform=aug)
    img, _flag = ds[2]                   # the png, through _load
    assert img.shape == (32, 32, 3)
    assert cache.misses == 1             # cached, not passthrough-decoded
    ds[2]
    assert cache.hits == 1
    # keyed + replayable: a fresh identically-seeded stack reproduces it
    cache2 = DecodedCache(str(tmp_path / "c"), base_size=48, paths=paths)
    aug2 = CachedAugment(cache2, NativeAugment(32, seed=5))
    np.testing.assert_array_equal(
        ImagePathDataset(paths, out_size=48, transform=aug2)[2][0], img)


def test_cache_legacy_dir_without_gen_file(tmp_path, jpegs):
    """Cache dirs written before gen.npy existed must reopen cleanly (the
    constructor creates the counters) and still serve every row."""
    import os

    d = str(tmp_path / "c")
    c1 = DecodedCache(d, base_size=32, paths=jpegs)
    c1.populate()
    os.remove(os.path.join(d, "gen.npy"))
    c2 = DecodedCache(d, base_size=32, paths=jpegs)
    assert c2.get(jpegs[1]).shape == (32, 32, 3)
    assert c2.hits == 1 and int(c2.gen[0]) == 0


def test_cache_survives_reopen(tmp_path, jpegs):
    d = str(tmp_path / "c")
    c1 = DecodedCache(d, base_size=32, paths=jpegs)
    first = {p: c1.get(p) for p in jpegs}
    c2 = DecodedCache(d, base_size=32, paths=jpegs)   # fresh process emu
    for p in jpegs:
        np.testing.assert_array_equal(c2.get(p), first[p])
    assert c2.misses == 0 and c2.hits == len(jpegs)


def test_cache_survives_reopen_in_shuffled_order(tmp_path, jpegs):
    """Row assignment is order-insensitive: the training CLIs shuffle path
    order every run, so a reopen with a permuted list (the restart/resume
    case) must keep every decoded row, not re-decode the corpus."""
    d = str(tmp_path / "c")
    c1 = DecodedCache(d, base_size=32, paths=jpegs)
    first = {p: c1.get(p) for p in jpegs}
    shuffled = [jpegs[i] for i in (4, 1, 5, 0, 3, 2)]
    c2 = DecodedCache(d, base_size=32, paths=shuffled)
    for p in shuffled:
        np.testing.assert_array_equal(c2.get(p), first[p])
    assert c2.misses == 0 and c2.hits == len(jpegs)


def test_cache_subset_reopen_keeps_rows(tmp_path, jpegs):
    d = str(tmp_path / "c")
    DecodedCache(d, base_size=32, paths=jpegs).populate()
    c2 = DecodedCache(d, base_size=32, paths=jpegs[2:5])
    for p in jpegs[2:5]:
        c2.get(p)
    assert c2.misses == 0 and c2.hits == 3
    # ...and the untouched rows are still there for a later full reopen
    c3 = DecodedCache(d, base_size=32, paths=jpegs)
    c3.populate()
    assert c3.misses == 0


def test_cache_corpus_growth_keeps_decoded_rows(tmp_path, jpegs):
    """Growing the corpus past file capacity grows the memmaps in place:
    already-decoded rows survive (no full re-decode when a user adds
    images to a dataset)."""
    from PIL import Image

    d = str(tmp_path / "c")
    c1 = DecodedCache(d, base_size=32, paths=jpegs[:3])
    first = {p: np.array(c1.get(p)) for p in jpegs[:3]}
    old_mapping = c1.data               # live mapping across the grow
    extra = str(tmp_path / "extra.jpg")
    Image.fromarray(np.zeros((64, 80, 3), np.uint8)).save(extra, quality=92)
    c2 = DecodedCache(d, base_size=32, paths=jpegs + [extra])
    c2.populate()                       # only the NEW paths decode
    assert c2.misses == len(jpegs) - 3 + 1
    for p in jpegs[:3]:
        np.testing.assert_array_equal(c2.get(p), first[p])
    assert c2.get(extra).shape == (32, 32, 3)
    # the pre-grow mapping still reads (grow renames, never truncates)
    assert int(np.asarray(old_mapping[0]).sum()) == int(first[jpegs[0]].sum())


def test_cache_missing_present_file_rebuilds_flags(tmp_path, jpegs):
    """A partial copy of a cache dir (index + data, no present.npy) must
    reopen with all-stale flags and refill lazily, not crash."""
    import os

    d = str(tmp_path / "c")
    c1 = DecodedCache(d, base_size=32, paths=jpegs)
    first = {p: c1.get(p) for p in jpegs}
    del c1
    os.remove(os.path.join(d, "present.npy"))
    c2 = DecodedCache(d, base_size=32, paths=jpegs)
    for p in jpegs:
        np.testing.assert_array_equal(c2.get(p), first[p])
    assert c2.misses == len(jpegs)      # flags lost → rows refill once


def test_cache_grow_from_truncated_data_refills_tail(tmp_path, jpegs):
    """Inconsistent pair (present.npy longer than data.npy, e.g. a partial
    copy of a cache dir): growing must not mark rows present beyond the
    copied pixel prefix — those rows have zero pixels and mtime-fresh paths
    assigned to them would silently serve black images (ADVICE r4)."""
    import os

    d = str(tmp_path / "c")
    c1 = DecodedCache(d, base_size=32, paths=jpegs)
    first = {p: np.array(c1.get(p)) for p in jpegs}
    rows = dict(c1._rows)
    del c1
    # truncate data.npy to a 3-row prefix, keep the full 6-row present.npy
    full = np.array(np.lib.format.open_memmap(os.path.join(d, "data.npy"),
                                              mode="r"))
    os.remove(os.path.join(d, "data.npy"))
    m = np.lib.format.open_memmap(os.path.join(d, "data.npy"), mode="w+",
                                  dtype=np.uint8, shape=(3,) + full.shape[1:])
    m[:] = full[:3]
    m.flush()
    del m
    c2 = DecodedCache(d, base_size=32, paths=jpegs)   # capacity 3 → grow to 6
    for p in jpegs:
        np.testing.assert_array_equal(c2.get(p), first[p])
    # exactly the tail rows (beyond the surviving pixel prefix) re-decoded
    assert c2.misses == sum(1 for p in jpegs if rows[p] >= 3)
    assert c2.hits == sum(1 for p in jpegs if rows[p] < 3)


def test_cache_invalidates_on_mtime_change(tmp_path, jpegs):
    import os

    from PIL import Image

    d = str(tmp_path / "c")
    c1 = DecodedCache(d, base_size=32, paths=jpegs)
    c1.populate()
    # rewrite one file with different pixels and a bumped mtime
    Image.fromarray(np.full((64, 80, 3), 200, np.uint8)).save(jpegs[2],
                                                              quality=92)
    os.utime(jpegs[2], ns=(1, 10**18))
    c2 = DecodedCache(d, base_size=32, paths=jpegs)
    fresh = c2.get(jpegs[2])
    assert c2.misses == 1                      # only the changed row refills
    assert fresh.mean() > 150                  # new content, not stale pixels


def test_cache_base_size_change_rebuilds(tmp_path, jpegs):
    d = str(tmp_path / "c")
    DecodedCache(d, base_size=32, paths=jpegs).populate()
    c2 = DecodedCache(d, base_size=48, paths=jpegs)
    assert c2.get(jpegs[0]).shape == (48, 48, 3)
    assert c2.misses == 1


def test_cache_unknown_path_passthrough(tmp_path, jpegs):
    c = DecodedCache(str(tmp_path / "c"), base_size=32, paths=jpegs[:2])
    out = c.get(jpegs[5])       # not in the cached set
    assert out.shape == (32, 32, 3)
    assert c.misses == 0        # passthrough is not a cache miss


def test_cached_augment_feeds_dataset_and_loader(tmp_path, jpegs):
    """End-to-end: ImagePathDataset + BatchLoader over the cache adapter —
    second epoch is all cache hits; augmented output differs per epoch
    (augment stays random) while the cached decode is identical."""
    from weather_unet_tpu.data.datasets import ImagePathDataset
    from weather_unet_tpu.data.pipeline import BatchLoader
    from weather_unet_tpu.data.transforms import make_train_augment

    aug = make_train_augment(24, resized_crop=True, seed=3)
    cache = DecodedCache(str(tmp_path / "c"), base_size=32, paths=jpegs)
    ds = ImagePathDataset(jpegs, out_size=32,
                          transform=CachedAugment(cache, aug))
    ld = BatchLoader(ds, batch_size=3, shuffle=False, num_workers=2)
    e1 = [b for b in ld]
    assert cache.misses == len(jpegs)
    e2 = [b for b in ld]
    assert cache.misses == len(jpegs)          # epoch 2: zero decodes
    assert cache.hits >= len(jpegs)
    assert e1[0][0].shape == (3, 24, 24, 3)
    # augmentation random state advances: epochs differ
    assert not np.array_equal(e1[0][0], e2[0][0])


def test_cache_concurrent_fill_is_consistent(tmp_path, jpegs):
    """BatchLoader runs the transform from multiple worker threads; the
    cache's documented benign-race design (identical bytes, flag set after
    pixels) must yield exactly the single-thread images with no torn rows."""
    import concurrent.futures

    d = str(tmp_path / "c")
    ref = {p: DecodedCache(str(tmp_path / "ref"), base_size=32,
                           paths=jpegs).get(p) for p in jpegs}
    c = DecodedCache(d, base_size=32, paths=jpegs)
    work = [p for _ in range(8) for p in jpegs]      # heavy same-row overlap
    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as ex:
        got = list(ex.map(c.get, work))
    for p, img in zip(work, got):
        np.testing.assert_array_equal(img, ref[p])
    assert all(c.present[r] for r in c._rows.values())
    # reopen sees fully-populated rows
    c2 = DecodedCache(d, base_size=32, paths=jpegs)
    c2.populate()
    assert c2.misses == 0


def test_cache_concurrent_process_construction(tmp_path, jpegs):
    """Multi-host training constructs the same cache dir from every rank at
    once (parallel.launch + --decode_cache).  The constructor's file lock
    must serialize creation: no crash, no torn files, and the dir reopens
    fully consistent afterwards."""
    import multiprocessing as mp

    d = str(tmp_path / "c")

    def worker(rank, q):
        try:
            c = DecodedCache(d, base_size=32, paths=jpegs)
            sums = [int(c.get(p).sum()) for p in jpegs]
            q.put((rank, sums))
        except Exception as e:  # pragma: no cover - failure reporting
            q.put((rank, repr(e)))

    ctx = mp.get_context("fork")
    q = ctx.Queue()
    procs = [ctx.Process(target=worker, args=(r, q)) for r in range(2)]
    for p in procs:
        p.start()
    results = dict(q.get(timeout=120) for _ in procs)
    for p in procs:
        p.join(timeout=120)
    assert all(pr.exitcode == 0 for pr in procs)
    assert isinstance(results[0], list) and results[0] == results[1], results

    c = DecodedCache(d, base_size=32, paths=jpegs)
    c.populate()
    assert c.misses == 0                # everything the ranks wrote persists
    assert [int(c.get(p).sum()) for p in jpegs] == results[0]
