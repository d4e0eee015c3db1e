"""Frame-IO tests: native PFM codec vs NumPy fallback, batch loader,
prefetcher (utils/frameio.py + native/frameio.cpp)."""

import os

import numpy as np
import pytest

from tpuao.utils import frameio as FIO
from tpuao.utils import native as N


def _frame(h=37, w=53, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0.05, 1.0, (h, w)).astype(np.float32)


def test_native_lib_builds():
    # This environment has g++; the native path must actually be active
    # (the fallback exists for toolchain-less installs, not for here).
    assert N.get_lib() is not None


def test_roundtrip_native(tmp_path):
    z = _frame()
    p = str(tmp_path / "d.pfm")
    FIO.save_pfm(p, z)
    got = FIO.load_pfm(p)
    np.testing.assert_array_equal(got, z)


def test_native_and_python_codecs_agree(tmp_path):
    z = _frame(21, 19, seed=3)
    p_native = str(tmp_path / "n.pfm")
    p_py = str(tmp_path / "p.pfm")
    FIO.save_pfm(p_native, z)
    FIO._save_pfm_py(p_py, z)
    with open(p_native, "rb") as a, open(p_py, "rb") as b:
        assert a.read() == b.read()  # byte-identical files
    np.testing.assert_array_equal(FIO._load_pfm_py(p_native),
                                  FIO.load_pfm(p_py))


def test_big_endian_pfm(tmp_path):
    z = _frame(8, 8, seed=5)
    p = str(tmp_path / "be.pfm")
    with open(p, "wb") as f:  # positive scale => big-endian samples
        f.write(b"Pf\n8 8\n1.0\n")
        f.write(z[::-1].astype(">f4").tobytes())
    np.testing.assert_array_equal(FIO.load_pfm(p), z)
    np.testing.assert_array_equal(FIO._load_pfm_py(p), z)


def test_batch_load_matches_singles(tmp_path):
    frames = [_frame(seed=i) for i in range(7)]
    paths = []
    for i, z in enumerate(frames):
        paths.append(FIO.save_pfm(str(tmp_path / f"f{i}.pfm"), z))
    batch = FIO.load_pfm_batch(paths, threads=4)
    assert batch.shape == (7, 37, 53) and batch.dtype == np.float32
    for i, z in enumerate(frames):
        np.testing.assert_array_equal(batch[i], z)


def _frame3(h=37, w=53, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1.0, 1.0, (h, w, 3)).astype(np.float32)


def test_pf_roundtrip_native_and_python(tmp_path):
    n = _frame3(seed=2)
    p_native = str(tmp_path / "n.pfm")
    p_py = str(tmp_path / "p.pfm")
    FIO.save_pfm(p_native, n)
    FIO._save_pfm_py(p_py, n)
    with open(p_native, "rb") as a, open(p_py, "rb") as b:
        assert a.read() == b.read()  # byte-identical 'PF' files
    np.testing.assert_array_equal(FIO.load_pfm(p_native), n)
    np.testing.assert_array_equal(FIO._load_pfm_py(p_py), n)


def test_pf_big_endian(tmp_path):
    n = _frame3(8, 8, seed=5)
    p = str(tmp_path / "be.pfm")
    with open(p, "wb") as f:  # positive scale => big-endian samples
        f.write(b"PF\n8 8\n1.0\n")
        f.write(n[::-1].astype(">f4").tobytes())
    np.testing.assert_array_equal(FIO.load_pfm(p), n)
    np.testing.assert_array_equal(FIO._load_pfm_py(p), n)


def test_pf_batch_load(tmp_path):
    frames = [_frame3(seed=i) for i in range(5)]
    paths = [FIO.save_pfm(str(tmp_path / f"n{i}.pfm"), f)
             for i, f in enumerate(frames)]
    batch = FIO.load_pfm_batch(paths, threads=3)
    assert batch.shape == (5, 37, 53, 3) and batch.dtype == np.float32
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(batch[i], f)


def test_batch_channel_mismatch_raises(tmp_path):
    p1 = FIO.save_pfm(str(tmp_path / "a.pfm"), _frame(16, 16))
    p2 = FIO.save_pfm(str(tmp_path / "b.pfm"), _frame3(16, 16))
    with pytest.raises(ValueError, match="size mismatch"):
        FIO.load_pfm_batch([p1, p2])


def test_prefetcher_tuple_batches(tmp_path):
    """(depth, normals, color) path tuples yield array tuples — the
    streaming normals + composite ingestion path (VERDICT r2 item 6)."""
    items = []
    for b in range(2):
        d = [FIO.save_pfm(str(tmp_path / f"d{b}_{i}.pfm"),
                          _frame(seed=b * 4 + i)) for i in range(2)]
        n = [FIO.save_pfm(str(tmp_path / f"n{b}_{i}.pfm"),
                          _frame3(seed=90 + b * 4 + i)) for i in range(2)]
        c = [FIO.save_pfm(str(tmp_path / f"c{b}_{i}.pfm"),
                          np.abs(_frame3(seed=50 + b * 4 + i)))
             for i in range(2)]
        items.append((d, n, c))
    got = list(FIO.FramePrefetcher(items, depth=2))
    assert len(got) == 2
    for b, (d, n, c) in enumerate(items):
        zs, ns, cs = got[b]
        assert zs.shape == (2, 37, 53)
        assert ns.shape == (2, 37, 53, 3)
        assert cs.shape == (2, 37, 53, 3)
        np.testing.assert_array_equal(zs, FIO.load_pfm_batch(d))
        np.testing.assert_array_equal(ns, FIO.load_pfm_batch(n))
        np.testing.assert_array_equal(cs, FIO.load_pfm_batch(c))


def test_pf_fallback_without_lib(tmp_path, monkeypatch):
    monkeypatch.setattr(FIO, "_lib", lambda: None)
    n = _frame3(12, 20, seed=9)
    p = FIO.save_pfm(str(tmp_path / "f.pfm"), n)
    np.testing.assert_array_equal(FIO.load_pfm(p), n)
    batch = FIO.load_pfm_batch([p, p])
    np.testing.assert_array_equal(batch[1], n)


def test_batch_size_mismatch_raises(tmp_path):
    p1 = FIO.save_pfm(str(tmp_path / "a.pfm"), _frame(16, 16))
    p2 = FIO.save_pfm(str(tmp_path / "b.pfm"), _frame(8, 8))
    with pytest.raises(ValueError, match="size mismatch"):
        FIO.load_pfm_batch([p1, p2])


def test_missing_and_corrupt_files(tmp_path):
    with pytest.raises(ValueError, match="cannot open"):
        FIO.load_pfm(str(tmp_path / "nope.pfm"))
    bad = tmp_path / "bad.pfm"
    bad.write_bytes(b"P6\n1 1\n255\n\0\0\0")  # a PPM, not a PFM
    with pytest.raises(ValueError, match="header"):
        FIO.load_pfm(str(bad))
    trunc = tmp_path / "trunc.pfm"
    trunc.write_bytes(b"Pf\n4 4\n-1.0\n" + b"\0" * 10)
    with pytest.raises(ValueError, match="truncated"):
        FIO.load_pfm(str(trunc))


def test_prefetcher_yields_all_batches_in_order(tmp_path):
    batches = []
    for b in range(3):
        paths = [FIO.save_pfm(str(tmp_path / f"b{b}_{i}.pfm"),
                              _frame(seed=10 * b + i)) for i in range(2)]
        batches.append(paths)
    got = list(FIO.FramePrefetcher(batches, depth=2))
    assert len(got) == 3
    for b, paths in enumerate(batches):
        np.testing.assert_array_equal(got[b], FIO.load_pfm_batch(paths))


def test_prefetcher_stopiteration_is_sticky(tmp_path):
    """next() past exhaustion must keep raising StopIteration, not block
    (regression: it used to deadlock on the empty queue)."""
    paths = [FIO.save_pfm(str(tmp_path / "s.pfm"), _frame())]
    it = FIO.FramePrefetcher([paths])
    assert len(list(it)) == 1
    with pytest.raises(StopIteration):
        next(it)
    with pytest.raises(StopIteration):
        next(it)


def test_prefetcher_close_releases_worker(tmp_path):
    """Abandoning iteration early + close() must stop the worker thread
    (regression: it used to stay blocked on the bounded queue forever)."""
    batches = []
    for b in range(6):
        batches.append([FIO.save_pfm(str(tmp_path / f"c{b}.pfm"),
                                     _frame(seed=b))])
    with FIO.FramePrefetcher(batches, depth=1) as it:
        next(it)  # consume one, abandon the rest
    assert not it._worker.is_alive()
    with pytest.raises(StopIteration):
        next(it)


def test_prefetcher_close_wakes_blocked_consumer(tmp_path):
    """close() from another thread must wake a consumer blocked in
    __next__ (regression: 'end' was dropped once _stop was set, leaving
    the consumer in an untimed get() forever)."""
    import threading
    import time

    path = FIO.save_pfm(str(tmp_path / "w.pfm"), _frame())

    def slow_batches():
        time.sleep(2.0)  # worker busy; consumer blocks on the empty queue
        yield [path]

    it = FIO.FramePrefetcher(slow_batches(), depth=1)
    stopped = threading.Event()

    def consume():
        try:
            next(it)
        except StopIteration:
            stopped.set()

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    time.sleep(0.2)
    it.close()
    t.join(timeout=10)
    assert not t.is_alive() and stopped.is_set()


def test_prefetcher_propagates_errors(tmp_path):
    good = [FIO.save_pfm(str(tmp_path / "g.pfm"), _frame())]
    it = FIO.FramePrefetcher([good, ["/nonexistent.pfm"]])
    next(it)
    with pytest.raises(ValueError, match="cannot open"):
        next(it)


def test_bytes_codec_roundtrip():
    for arr in (_frame(9, 11, seed=7), _frame3(9, 11, seed=8)):
        got = FIO.loads_pfm(FIO.dumps_pfm(arr))
        np.testing.assert_array_equal(got, arr)


def test_loads_pfm_multi_roundtrip():
    """Concatenated PFM frames (the serving multi-buffer body) split back
    into the original frames; mixed 'Pf'/'PF', whitespace tolerated."""
    frames = [_frame(9, 11, seed=7), _frame3(9, 11, seed=8),
              _frame3(9, 11, seed=9)]
    body = b"".join(FIO.dumps_pfm(f) for f in frames)
    got = FIO.loads_pfm_multi(body)
    assert len(got) == 3
    for g, want in zip(got, frames):
        np.testing.assert_array_equal(g, want)
    # single frame degenerates to [loads_pfm(...)]
    one = FIO.loads_pfm_multi(FIO.dumps_pfm(frames[0]))
    assert len(one) == 1
    np.testing.assert_array_equal(one[0], frames[0])
    # trailing whitespace is tolerated; other trailing bytes are not
    assert len(FIO.loads_pfm_multi(body + b"\n  ")) == 3
    for bad in (b"", body + b"garbage", body[:-4]):
        with pytest.raises(ValueError):
            FIO.loads_pfm_multi(bad)


def test_loads_pfm_truncated_raises_not_hangs():
    """EOF in any header position must raise, not spin (the whitespace
    loops used to loop forever on b'' -- a remotely triggerable hang
    once serve.py fed loads_pfm raw network bodies)."""
    for bad in (b"", b"Pf", b"Pf\n4", b"Pf\n4 4", b"Pf\n4 4\n-1.0",
                b"Pf\n4 4\n-1.0\n\0\0", b"# only a comment",
                b"Pf\n4 4\n"):
        with pytest.raises(ValueError):
            FIO.loads_pfm(bad)


def test_fallback_used_without_lib(tmp_path, monkeypatch):
    monkeypatch.setattr(FIO, "_lib", lambda: None)
    z = _frame(12, 20, seed=9)
    p = FIO.save_pfm(str(tmp_path / "f.pfm"), z)
    np.testing.assert_array_equal(FIO.load_pfm(p), z)
    batch = FIO.load_pfm_batch([p, p])
    np.testing.assert_array_equal(batch[1], z)
