"""Native C++ data-plane: byte parity with the pure-numpy assembler."""

from datetime import datetime

import numpy as np
import pytest

from tests import conftest as C  # noqa: F401
from vit_grid_model_tpu.data import assembly, native, readers, synthetic
from vit_grid_model_tpu.data import timeutil as TU


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("native")
    paths = synthetic.generate_tree(
        str(root), datetime(2023, 2, 1, 0), datetime(2023, 2, 1, 5),
        prev_len=3, output_dim=2, korea_stn_num=4, china_stn_num=2)
    readers.clear_caches()
    return paths


@pytest.mark.skipif(not native.available(),
                    reason="native library unavailable (no g++?)")
def test_assemble_matches_numpy(tree):
    times = TU.eval_time_list(datetime(2023, 2, 1, 0),
                              datetime(2023, 2, 1, 5), 3, 2)
    window = times[2:7]       # arbitrary 5 consecutive steps
    out = native.assemble_steps_native(
        window, tree["sim_data_path"], synthetic.DEFAULT_FEAT_INFOS, 6,
        (82, 67))
    assert out is not None
    stack_n, pm25_n = out

    # numpy reference via the shared block assembler
    blocks, pms = [], []
    for t in window:
        block, pm25, _ = assembly.cycle_block(
            t, tree["sim_data_path"], synthetic.DEFAULT_FEAT_INFOS, 6,
            (82, 67))
        blocks.append(block)
        pms.append(pm25)
    stack_ref = np.concatenate(blocks, axis=-1)
    np.testing.assert_allclose(stack_n, stack_ref, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(pm25_n, np.stack(pms), rtol=1e-6)


@pytest.mark.skipif(not native.available(),
                    reason="native library unavailable (no g++?)")
def test_zero_fill_faults(tree, tmp_path):
    # a missing and a malformed file both become zero grids
    bad = tmp_path / "bad.npy"
    np.save(bad, np.zeros(7, np.float32))       # wrong rank
    out = native.load_cycle_files_native(
        [str(tmp_path / "missing.npy"), str(bad)], 6, (82, 67))
    assert out is not None and (out == 0).all()


@pytest.mark.skipif(not native.available(),
                    reason="native library unavailable (no g++?)")
def test_float64_files(tmp_path):
    arr = np.random.default_rng(0).random((6, 82, 67))    # f8 on disk
    p = tmp_path / "f8.npy"
    np.save(p, arr)
    out = native.load_cycle_files_native([str(p)], 6, (82, 67))
    np.testing.assert_allclose(out[0], arr.astype(np.float32), rtol=1e-6)


@pytest.mark.skipif(not native.available(),
                    reason="native library unavailable (no g++?)")
def test_dataset_native_path_matches_numpy(tree):
    from vit_grid_model_tpu.data.datasets import AirSimulationReanalysisDatasetOnly

    times = TU.eval_time_list(datetime(2023, 2, 1, 0),
                              datetime(2023, 2, 1, 5), 3, 2)
    feats = np.random.default_rng(0).random((len(times), 6, 12)).astype(np.float32)
    masks = np.ones((len(times), 6))
    kwargs = dict(input_dim=2, output_dim=2, prev_len=3, korea_stn_num=4,
                  china_stn_num=2, cmaq_size=(82, 67),
                  sim_data_path=tree["sim_data_path"],
                  reanalysis_data_path=tree["analysis_data_path"],
                  feat_infos=synthetic.DEFAULT_FEAT_INFOS)
    ds = AirSimulationReanalysisDatasetOnly(times, feats, masks, **kwargs)
    ds.use_native = True
    a = ds[1]
    ds.use_native = False
    b = ds[1]
    for i, (x, y) in enumerate(zip(a, b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-6, err_msg=str(i))


def _npy_variants(rng):
    """(name, array, writer) matrix: every header/dtype/order variant
    np.load accepts (reference reader, dataset.py:784-789)."""
    base = (rng.random((6, 82, 67)) * 80).astype(np.float32)
    variants = {
        "c_f4_le": base,
        "c_f8_le": base.astype(np.float64),
        "c_f4_be": base.astype(">f4"),
        "c_f8_be": base.astype(">f8"),
        "c_f2": base.astype(np.float16),
        "fortran_f4": np.asfortranarray(base),
        "fortran_f8_be": np.asfortranarray(base.astype(">f8")),
        "c_i1": (base % 100).astype(np.int8),
        "c_u1": (base % 200).astype(np.uint8),
        "c_i2_le": base.astype(np.int16),
        "c_i2_be": base.astype(">i2"),
        "c_i4_le": base.astype(np.int32),
        "c_u4_be": base.astype(">u4"),
        "c_i8_le": base.astype(np.int64),
        "c_i8_be": base.astype(">i8"),
        "c_bool": (base > 40.0),
    }
    return variants


@pytest.mark.skipif(not native.available(),
                    reason="native library unavailable (no g++?)")
def test_npy_fidelity_matrix_vs_np_load(tmp_path):
    """Differential matrix (round-2 verdict item 5): every dtype/endianness/
    order variant np.load handles must load to the same float32 grid through
    the native reader — no silent zero-fill of valid files."""
    rng = np.random.default_rng(0)
    native.reset_unsupported_count()
    for name, arr in _npy_variants(rng).items():
        p = tmp_path / f"{name}.npy"
        np.save(p, arr)
        out = native.load_cycle_files_native([str(p)], 6, (82, 67))
        want = np.load(p).astype(np.float32)
        np.testing.assert_allclose(out[0], want, rtol=1e-6, atol=1e-6,
                                   err_msg=name)
        assert not (out == 0).all() or (want == 0).all(), name
    assert native.unsupported_count() == 0


@pytest.mark.skipif(not native.available(),
                    reason="native library unavailable (no g++?)")
def test_npy_v1_v2_v3_headers(tmp_path):
    """All three .npy format versions parse (numpy only writes v1/v2;
    v3 is hand-assembled: identical layout with a UTF-8 header)."""
    rng = np.random.default_rng(1)
    arr = rng.random((6, 82, 67)).astype(np.float32)
    p1 = tmp_path / "v1.npy"
    np.save(p1, arr)                                    # v1 by default
    p2 = tmp_path / "v2.npy"
    with open(p2, "wb") as f:
        np.lib.format.write_array(f, arr, version=(2, 0))
    # v3: magic \x93NUMPY\x03\x00 + uint32 header length + same dict
    v1 = p1.read_bytes()
    hlen = int.from_bytes(v1[8:10], "little")
    header, payload = v1[10:10 + hlen], v1[10 + hlen:]
    # re-pad so magic(8) + len(4) + header is 64-aligned like numpy does
    raw = header.rstrip(b" \n")
    total = 8 + 4 + len(raw) + 1
    pad = (64 - total % 64) % 64
    header3 = raw + b" " * pad + b"\n"
    p3 = tmp_path / "v3.npy"
    p3.write_bytes(b"\x93NUMPY\x03\x00"
                   + len(header3).to_bytes(4, "little") + header3 + payload)
    np.testing.assert_array_equal(np.load(p3), arr)     # numpy agrees it's valid
    native.reset_unsupported_count()
    for p in (p1, p2, p3):
        out = native.load_cycle_files_native([str(p)], 6, (82, 67))
        np.testing.assert_allclose(out[0], arr, rtol=1e-6, err_msg=str(p))
    assert native.unsupported_count() == 0


@pytest.mark.skipif(not native.available(),
                    reason="native library unavailable (no g++?)")
def test_npy_loud_failures(tmp_path, capfd):
    """Never silent-zero a file np.load would accept: wrong element count
    (right rank) and truncated payloads zero-fill LOUDLY — stderr line +
    vg_unsupported_count — while the reference-parity faults (missing,
    wrong rank, non-npy garbage) stay silent zeros."""
    rng = np.random.default_rng(2)
    native.reset_unsupported_count()

    wrong_shape = tmp_path / "wrong_shape.npy"
    np.save(wrong_shape, rng.random((6, 10, 10)).astype(np.float32))
    good = rng.random((6, 82, 67)).astype(np.float32)
    truncated = tmp_path / "truncated.npy"
    full = tmp_path / "full.npy"
    np.save(full, good)
    truncated.write_bytes(full.read_bytes()[:-1000])

    out = native.load_cycle_files_native(
        [str(wrong_shape), str(truncated)], 6, (82, 67))
    assert (out == 0).all()
    assert native.unsupported_count() == 2
    err = capfd.readouterr().err
    assert "wrong_shape.npy" in err and "truncated.npy" in err

    # reference-parity silent faults do not touch the loud counter
    native.reset_unsupported_count()
    garbage = tmp_path / "garbage.npy"
    garbage.write_bytes(b"not an npy file at all")
    wrong_rank = tmp_path / "wrong_rank.npy"
    np.save(wrong_rank, rng.random(7).astype(np.float32))
    out = native.load_cycle_files_native(
        [str(tmp_path / "missing.npy"), str(garbage), str(wrong_rank)],
        6, (82, 67))
    assert (out == 0).all()
    assert native.unsupported_count() == 0


@pytest.mark.skipif(not native.available(),
                    reason="native library unavailable (no g++?)")
def test_get_batch_union_matches_per_sample(tree):
    """Batch-level union assembly (consecutive samples share all but one
    CMAQ step) must be byte-identical to per-sample assembly, for both the
    eval (_only) and train (v3) dataset classes; shuffled indices fall back
    to the per-sample path."""
    from vit_grid_model_tpu.data.datasets import (
        AirSimulationReanalysisDatasetOnly, AirSimulationReanalysisDatasetV3)

    times = TU.eval_time_list(datetime(2023, 2, 1, 0),
                              datetime(2023, 2, 1, 5), 3, 2)
    rng = np.random.default_rng(0)
    feats = rng.random((len(times), 6, 12)).astype(np.float32)
    masks = np.ones((len(times), 6))
    kwargs = dict(input_dim=2, output_dim=2, prev_len=3, korea_stn_num=4,
                  china_stn_num=2, cmaq_size=(82, 67),
                  sim_data_path=tree["sim_data_path"],
                  reanalysis_data_path=tree["analysis_data_path"],
                  feat_infos=synthetic.DEFAULT_FEAT_INFOS)
    for cls in (AirSimulationReanalysisDatasetOnly,
                AirSimulationReanalysisDatasetV3):
        ds = cls(times, feats, masks, **kwargs)
        n = min(len(ds), 5)
        per_sample = [ds[i] for i in range(n)]
        batched = ds.get_batch(list(range(n)))
        assert not ds._sim_cache          # cache cleared after the batch
        for a, b in zip(per_sample, batched):
            for j, (x, y) in enumerate(zip(a, b)):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                              err_msg=f"{cls.__name__}[{j}]")
        # non-consecutive indices: falls back, still equal
        idx = [2, 0, 3][:n]
        for a, b in zip([ds[i] for i in idx], ds.get_batch(idx)):
            for x, y in zip(a, b):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.skipif(not native.available(),
                    reason="native library unavailable (no g++?)")
def test_get_batch_collated_byte_identical(tree):
    """The fully-collated native batch path (one ``vg_assemble_batch`` pass
    straight into the batched (B, H, W, C) layout — no Python slice or
    np.stack copies for the sim tensor) must be byte-identical to stacking
    per-sample assembly, for the eval (_only) and train (v3) classes.
    The fixture geometry has ``hist = prev_len - input_dim = 1 > 0``, so
    the kept-window offset is exercised too."""
    from vit_grid_model_tpu.data.datasets import (
        AirSimulationReanalysisDatasetOnly, AirSimulationReanalysisDatasetV3,
        _stack)

    times = TU.eval_time_list(datetime(2023, 2, 1, 0),
                              datetime(2023, 2, 1, 5), 3, 2)
    rng = np.random.default_rng(1)
    feats = rng.random((len(times), 6, 12)).astype(np.float32)
    masks = np.ones((len(times), 6))
    kwargs = dict(input_dim=2, output_dim=2, prev_len=3, korea_stn_num=4,
                  china_stn_num=2, cmaq_size=(82, 67),
                  sim_data_path=tree["sim_data_path"],
                  reanalysis_data_path=tree["analysis_data_path"],
                  feat_infos=synthetic.DEFAULT_FEAT_INFOS)
    for cls in (AirSimulationReanalysisDatasetOnly,
                AirSimulationReanalysisDatasetV3):
        ds = cls(times, feats, masks, **kwargs)
        n = min(len(ds), 4)
        chunk = list(range(n))
        fast = ds.get_batch_collated(chunk)
        assert fast is not None
        assert not ds._sim_cache
        slow = _stack([ds[i] for i in chunk])
        assert len(fast) == len(slow)
        for j, (a, b) in enumerate(zip(fast, slow)):
            assert a.dtype == b.dtype, (cls.__name__, j)
            np.testing.assert_array_equal(a, b,
                                          err_msg=f"{cls.__name__}[{j}]")
        # shuffled or single-sample chunks: no fast path
        assert ds.get_batch_collated([2, 0]) is None
        assert ds.get_batch_collated([1]) is None
        # native disabled: no fast path
        ds.use_native = False
        assert ds.get_batch_collated(chunk) is None
        ds.use_native = None


@pytest.mark.skipif(not native.available(),
                    reason="native library unavailable (no g++?)")
def test_assemble_batch_native_matches_union_slices(tree):
    """``vg_assemble_batch`` == slicing a ``vg_assemble_sample`` union
    assembly per sample, including the union-level PM2.5 planes."""
    times = TU.eval_time_list(datetime(2023, 2, 1, 0),
                              datetime(2023, 2, 1, 5), 3, 2)
    n_samples, n_steps, hist = 3, 5, 1      # prev_len 3 + output 2, in 2
    union = times[0: n_samples - 1 + n_steps]
    batch, pm25_b = native.assemble_batch_native(
        union, n_samples, hist, n_steps, tree["sim_data_path"],
        synthetic.DEFAULT_FEAT_INFOS, 6, (82, 67))
    stack, pm25_u = native.assemble_steps_native(
        union, tree["sim_data_path"], synthetic.DEFAULT_FEAT_INFOS, 6,
        (82, 67))
    np.testing.assert_array_equal(pm25_b, pm25_u)
    bc = 4 * 6 + 4
    for b in range(n_samples):
        np.testing.assert_array_equal(
            batch[b], stack[:, :, (b + hist) * bc: (b + n_steps) * bc],
            err_msg=f"sample {b}")


@pytest.mark.skipif(not native.available(),
                    reason="native library unavailable (no g++?)")
def test_batch_loader_uses_collated_fast_path(tree):
    """The single-dispatch BatchLoader must produce identical batches via
    the collated fast path, and must NOT use it under a custom collate."""
    from vit_grid_model_tpu.data.datasets import (
        AirSimulationReanalysisDatasetOnly)
    from vit_grid_model_tpu.data.pipeline import BatchLoader

    times = TU.eval_time_list(datetime(2023, 2, 1, 0),
                              datetime(2023, 2, 1, 5), 3, 2)
    rng = np.random.default_rng(2)
    feats = rng.random((len(times), 6, 12)).astype(np.float32)
    masks = np.ones((len(times), 6))
    ds = AirSimulationReanalysisDatasetOnly(
        times, feats, masks, input_dim=2, output_dim=2, prev_len=3,
        korea_stn_num=4, china_stn_num=2, cmaq_size=(82, 67),
        sim_data_path=tree["sim_data_path"],
        reanalysis_data_path=tree["analysis_data_path"],
        feat_infos=synthetic.DEFAULT_FEAT_INFOS)

    fast = list(BatchLoader(ds, batch_size=2, dispatch="single"))
    ds.use_native = False       # forces per-sample numpy assembly
    slow = list(BatchLoader(ds, batch_size=2, dispatch="single"))
    ds.use_native = None
    assert len(fast) == len(slow) > 0
    for fb, sb in zip(fast, slow):
        for j, (a, b) in enumerate(zip(fb, sb)):
            np.testing.assert_array_equal(a, b, err_msg=f"field {j}")

    # custom collate: the loader must fall back to collate(samples)
    calls = []

    def my_collate(samples):
        calls.append(len(samples))
        return tuple(np.stack(f) for f in zip(*samples))

    custom = list(BatchLoader(ds, batch_size=2, dispatch="single",
                              collate=my_collate))
    assert calls and len(custom) == len(fast)
    for fb, cb in zip(fast, custom):
        for a, b in zip(fb, cb):
            np.testing.assert_array_equal(a, b)


def test_output_pool_reuse_and_no_aliasing():
    """The output pool hands back an idle buffer, but never one that any
    external holder (queued batch, view, staged transfer) still references."""
    from vit_grid_model_tpu.data.bufferpool import BufferPool

    pool = BufferPool(max_per_key=2)
    a = pool.get((4, 8))
    assert pool.get((4, 8)) is not a          # `a` is held -> fresh buffer
    b = pool.get((4, 8))
    view = b[1:]                              # a view keeps `b` busy
    addr_a = a.ctypes.data
    del a
    c = pool.get((4, 8))
    assert c.ctypes.data == addr_a            # idle slot -> reused
    assert pool.get((4, 8)) is not b          # still viewed -> not reused
    addr_b = b.ctypes.data
    del b                                     # ...but the view still holds it
    assert pool.get((4, 8)).ctypes.data != addr_b
    del view                                  # last holder gone -> reusable
    assert pool.get((4, 8)).ctypes.data == addr_b
    assert pool.get((2, 2)).shape == (2, 2)   # distinct key, distinct pool


def test_output_pool_retention_adapts_to_reservoir():
    """ensure_retention raises (never lowers) the per-key cap so the
    shuffle-buffer reservoir's working set survives the epoch drain
    instead of re-allocating (and re-faulting) every epoch."""
    from vit_grid_model_tpu.data.bufferpool import BufferPool

    pool = BufferPool(max_per_key=2)
    key = pool.key((2, 2))
    pool.ensure_retention(5, key)
    pool.ensure_retention(3, key)             # never lowers
    held = [pool.get((2, 2)) for _ in range(5)]
    addrs = {b.ctypes.data for b in held}
    del held                                  # all 5 retained (cap 5 now)
    got = [pool.get((2, 2)) for _ in range(5)]   # hold while drawing
    assert {b.ctypes.data for b in got} == addrs
    # the elevated cap is scoped to ITS key (advisor r4): an unrelated
    # shape still retains only the default 2
    other = [pool.get((3, 3)) for _ in range(5)]
    other_addrs = [b.ctypes.data for b in other]
    del other
    kept = {b.ctypes.data for b in [pool.get((3, 3)) for _ in range(2)]}
    assert kept <= set(other_addrs) and len(kept) == 2
    # global raise still works and never lowers per-key overrides
    pool.ensure_retention(4)
    assert pool.get((2, 2)).shape == (2, 2)


@pytest.mark.skipif(not native.available(),
                    reason="native library unavailable (no g++?)")
def test_repack_model_input_native_parity():
    """Native repack == the numpy reshape/transpose/slice contract, for f32
    and for the fused bf16 cast (round-to-nearest-even incl. specials)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    b, h, w, t, s = 3, 11, 7, 5, 6
    bc = 4 * s + 4
    sim = (rng.random((b, h, w, t * bc), np.float32) * 80) - 10
    # rounding / special-value coverage for the bf16 path
    sim.ravel()[:6] = [np.nan, np.inf, -np.inf, 0.0, -0.0, 3.4e38]
    want = np.ascontiguousarray(
        sim.reshape(b, h, w, t, bc).transpose(0, 3, 4, 1, 2)[:, :, :-4])
    for dtype in (np.float32, jnp.bfloat16):
        out = np.empty(want.shape, dtype)
        assert native.repack_model_input_native(sim, t, out)
        ref = want.astype(dtype)
        np.testing.assert_array_equal(
            out.view(np.uint16 if dtype != np.float32 else np.float32),
            ref.view(np.uint16 if dtype != np.float32 else np.float32),
            err_msg=str(dtype))


def test_output_pool_concurrent_no_crosstalk():
    """Hammer one pool from several threads: every thread stamps its
    buffer with a unique pattern and must read it back intact — an
    aliased hand-out (two holders, one buffer) would corrupt the stamp."""
    import threading

    from vit_grid_model_tpu.data.bufferpool import BufferPool

    pool = BufferPool(max_per_key=3)
    errors = []

    def worker(tid):
        rng = np.random.default_rng(tid)
        try:
            for it in range(200):
                arr = pool.get((64, 64))
                stamp = np.float32(tid * 1000 + it)
                arr.fill(stamp)
                if rng.random() < 0.3:
                    _held = arr[3:]          # keep a view alive briefly
                for _ in range(3):
                    if not (arr == stamp).all():
                        errors.append((tid, it))
                        return
        except Exception as e:      # surfaced after join
            errors.append((tid, repr(e)))

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors[:5]


@pytest.mark.skipif(not native.available(),
                    reason="native library unavailable (no g++?)")
def test_npy_header_fuzz_never_crashes(tmp_path):
    """200 random corruptions of a valid .npy (byte flips, truncations,
    header-length lies) must zero-fill or load — never crash the process
    (a C++ parser fault would abort the interpreter)."""
    rng = np.random.default_rng(11)
    arr = rng.random((6, 82, 67)).astype(np.float32)
    p0 = tmp_path / "good.npy"
    np.save(p0, arr)
    blob = bytearray(p0.read_bytes())
    p = tmp_path / "fuzz.npy"
    for it in range(200):
        mutated = bytearray(blob)
        kind = it % 4
        if kind == 0:      # flip bytes in the first 256 (magic + header)
            for _ in range(rng.integers(1, 6)):
                mutated[rng.integers(0, min(256, len(mutated)))] = rng.integers(0, 256)
        elif kind == 1:    # truncate anywhere
            mutated = mutated[:rng.integers(0, len(mutated))]
        elif kind == 2:    # lie about the header length
            mutated[8:10] = int(rng.integers(0, 65536)).to_bytes(2, "little")
        else:              # random garbage of random size
            mutated = bytearray(rng.integers(0, 256, rng.integers(0, 400),
                                             dtype=np.uint8).tobytes())
        p.write_bytes(bytes(mutated))
        out = native.load_cycle_files_native([str(p)], 6, (82, 67))
        assert out is not None and out.shape == (1, 6, 82, 67)
        assert np.isfinite(out).all() or (out == 0).all() or True  # no crash is the assertion
