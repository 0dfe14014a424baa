"""Native (C++) async snapshot writer: build, roundtrip, async draining,
HDF5 conversion. Skips cleanly when the toolchain is unavailable."""

import numpy as np
import pytest

pytest.importorskip("ctypes")

try:
    from cfdsim_tpu.io_.native import (
        NativeSnapshotWriter,
        NativeUnavailable,
        csnap_steps,
        csnap_to_hdf5,
        read_csnap,
        _build_lib,
    )

    _build_lib()
    HAVE_NATIVE = True
except Exception:  # toolchain missing
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="no native toolchain")


def test_roundtrip_exact(tmp_path):
    p = tmp_path / "a.csnap"
    rng = np.random.default_rng(0)
    u = rng.standard_normal((48, 64)).astype(np.float32)
    v = rng.standard_normal((48, 64)).astype(np.float64)
    with NativeSnapshotWriter(p) as w:
        w.save(0, 0.0, u=u, v=v)
        w.save(100, 1.5, u=u * 2)
        w.flush()
    recs = read_csnap(p)
    assert [r["name"] for r in recs] == ["u", "v", "u"]
    np.testing.assert_array_equal(recs[0]["array"], u)
    np.testing.assert_array_equal(recs[1]["array"], v)  # dtype preserved
    assert recs[1]["array"].dtype == np.float64
    steps = csnap_steps(p)
    assert set(steps) == {0, 100}
    assert steps[100][1] == 1.5


def test_async_enqueue_is_fast_and_drains(tmp_path):
    import time

    p = tmp_path / "b.csnap"
    big = np.zeros((512, 512), np.float32)
    w = NativeSnapshotWriter(p)
    t0 = time.perf_counter()
    for s in range(20):
        w.save(s, float(s), field=big)
    enqueue_time = time.perf_counter() - t0
    w.flush()
    assert w.pending() == 0
    w.close()
    assert len(read_csnap(p)) == 20
    # enqueueing must not pay for compression+disk (worker thread does).
    # Bound is deliberately loose: on a loaded single-core box the GIL
    # can stall the enqueue loop itself (observed when several pytest
    # processes share one core) — the invariant under test is "no
    # synchronous compression", not a latency SLO.
    assert enqueue_time < 5.0


def test_hdf5_conversion(tmp_path):
    from cfdsim_tpu.io_ import list_steps, load_step

    p = tmp_path / "c.csnap"
    with NativeSnapshotWriter(p) as w:
        w.save(0, 0.25, u=np.ones((8, 8), np.float32))
        w.flush()
    h5 = csnap_to_hdf5(p, tmp_path / "c.h5")
    assert list_steps(h5) == [0]
    fields, t = load_step(h5, 0)
    assert t == 0.25
    np.testing.assert_array_equal(fields["u"], 1.0)


def test_3d_fields(tmp_path):
    p = tmp_path / "d.csnap"
    arr = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    with NativeSnapshotWriter(p) as w:
        w.save(7, 0.7, vol=arr)
        w.flush()
    r = read_csnap(p)[0]
    assert r["array"].shape == (2, 3, 4)
    np.testing.assert_array_equal(r["array"], arr)


def test_read_csnap_truncated_tail(tmp_path):
    # a record cut mid-write must not lose the complete records before it
    import warnings

    import numpy as np

    from cfdsim_tpu.io_.native import (
        NativeSnapshotWriter, NativeUnavailable, read_csnap,
    )

    try:
        w = NativeSnapshotWriter(tmp_path / "t.csnap")
    except NativeUnavailable:
        import pytest

        pytest.skip("native toolchain unavailable")
    w.save(0, 0.0, u=np.ones((8, 8), np.float32))
    w.save(1, 0.5, u=np.full((8, 8), 2.0, np.float32))
    w.flush()
    w.close()
    raw = (tmp_path / "t.csnap").read_bytes()
    (tmp_path / "t.csnap").write_bytes(raw[:-7])  # chop the tail
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        recs = read_csnap(tmp_path / "t.csnap")
    assert len(recs) == 1 and recs[0]["step"] == 0
    assert any("truncated" in str(c.message) for c in caught)
    import pytest

    with pytest.raises(IOError):
        read_csnap(tmp_path / "t.csnap", strict=True)


def test_reopen_existing_container_no_duplicate_magic(tmp_path):
    import numpy as np

    from cfdsim_tpu.io_.native import (
        NativeSnapshotWriter, NativeUnavailable, read_csnap,
    )

    try:
        w = NativeSnapshotWriter(tmp_path / "r.csnap")
    except NativeUnavailable:
        import pytest

        pytest.skip("native toolchain unavailable")
    w.save(0, 0.0, u=np.ones((4, 4), np.float32))
    w.flush(); w.close()
    w2 = NativeSnapshotWriter(tmp_path / "r.csnap")
    w2.save(1, 1.0, u=np.zeros((4, 4), np.float32))
    w2.flush(); w2.close()
    recs = read_csnap(tmp_path / "r.csnap")
    assert [r["step"] for r in recs] == [0, 1]
