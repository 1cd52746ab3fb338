"""Data-layer tests: cycle/lead arithmetic invariants, fault semantics,
synthetic fixtures, the input pipeline, and byte-level parity of the
assembled samples against the reference dataset classes."""

import os
from datetime import datetime, timedelta

import numpy as np
import pytest

from tests import conftest as C
from vit_grid_model_tpu.data import assembly, readers, synthetic
from vit_grid_model_tpu.data import timeutil as TU
from vit_grid_model_tpu.data.datasets import (
    AirOnlyDataset, AirSimulationReanalysisDatasetOnly,
    AirSimulationReanalysisDatasetV3)
from vit_grid_model_tpu.data.pipeline import BatchLoader


# ---------------------------------------------------------------------------
# timeutil
# ---------------------------------------------------------------------------

def test_cycle_refs_invariants():
    """init_time + lead == valid time, lead >= 3, for every hour."""
    for day in (datetime(2023, 1, 1), datetime(2023, 3, 1),
                datetime(2022, 12, 31)):
        for hour in range(24):
            t = day.replace(hour=hour)
            for ref in TU.cycle_refs(t):
                init = datetime(ref.date.year, ref.date.month, ref.date.day,
                                ref.cycle)
                assert init + timedelta(hours=ref.lead) == t, (t, ref)
                assert ref.lead >= 3


def test_cycle_refs_match_reference_branches():
    """Spot-check the hand-traced reference values (``dataset.py:755-781``)."""
    # KST 2023-01-10 00:00 -> UTC 2023-01-09 15:00
    refs = TU.cycle_refs(TU.kst_to_utc(datetime(2023, 1, 10, 0)))
    by_cycle = {r.cycle: r for r in refs}
    assert by_cycle[3].lead == 15 + 21 and by_cycle[3].date.day == 8
    assert by_cycle[21].lead == 15 + 3 and by_cycle[21].date.day == 8
    # UTC hour 2 (< 3): roll back two days, lead += 24
    refs = TU.cycle_refs(datetime(2023, 1, 9, 2))
    by_cycle = {r.cycle: r for r in refs}
    assert by_cycle[3].date.day == 7 and by_cycle[3].lead == 2 + 21 + 24
    assert by_cycle[9].date.day == 7 and by_cycle[9].lead == 2 + 15 + 24


def test_file_name_formats():
    ref = TU.CycleRef(3, datetime(2023, 1, 8), 36)
    assert TU.cmaq_file_name("/sim", ref) == "/sim/2023/010803_36.npy"
    assert (TU.reanalysis_file_name("/re", datetime(2023, 1, 9, 15))
            == "/re/2023/ACONC.PM_RQ40i8a.KNU_09_01.20230109.nc")


# ---------------------------------------------------------------------------
# readers: zero-fill fault semantics
# ---------------------------------------------------------------------------

def test_missing_cmaq_file_zero_fills(tmp_path):
    out = readers.load_cmaq_npy(str(tmp_path / "nope.npy"), 6, (82, 67))
    assert out.shape == (6, 82, 67) and (out == 0).all()


def test_malformed_cmaq_file_zero_fills(tmp_path):
    p = tmp_path / "bad.npy"
    np.save(p, np.zeros((5,)))          # wrong ndim
    out = readers.load_cmaq_npy(str(p), 6, (82, 67))
    assert out.shape == (6, 82, 67) and (out == 0).all()


def test_fault_injection_hook(tmp_path):
    p = tmp_path / "ok.npy"
    np.save(p, np.ones((6, 82, 67), dtype=np.float32))
    readers.clear_caches()
    try:
        readers.set_fault_injection(lambda path: "ok.npy" in path)
        out = readers.load_cmaq_npy(str(p), 6, (82, 67))
        assert (out == 0).all()
    finally:
        readers.set_fault_injection(None)
        readers.clear_caches()


# ---------------------------------------------------------------------------
# synthetic tree + dataset assembly
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    paths = synthetic.generate_tree(
        str(root), datetime(2023, 1, 10, 0), datetime(2023, 1, 10, 6),
        prev_len=4, output_dim=2, korea_stn_num=8, china_stn_num=3)
    readers.clear_caches()
    return paths


def _times(prev_len=4, output_dim=2):
    return TU.eval_time_list(datetime(2023, 1, 10, 0),
                             datetime(2023, 1, 10, 6), prev_len, output_dim)


def _feats(times, total_stn=11, feat_dim=12):
    rng = np.random.default_rng(0)
    f = rng.random((len(times), total_stn, feat_dim)).astype(np.float32)
    m = np.ones((len(times), total_stn))
    return f, m


def test_dataset_only_shapes(tree):
    times = _times()
    feats, masks = _feats(times)
    ds = AirSimulationReanalysisDatasetOnly(
        times, feats, masks, input_dim=3, output_dim=2, prev_len=4,
        korea_stn_num=8, china_stn_num=3, cmaq_size=(82, 67),
        sim_data_path=tree["sim_data_path"],
        reanalysis_data_path=tree["analysis_data_path"],
        feat_infos=synthetic.DEFAULT_FEAT_INFOS)
    assert len(ds) == len(times) - 3 - 2
    sim, curr, re, cls, raw, prev = ds[0]
    assert sim.shape == (82, 67, 5 * 28)
    assert curr.shape == (82, 67) and re.shape == (2, 82, 67)
    assert cls.shape == (2, 82, 67) and set(np.unique(cls)) <= {0, 1, 2, 3}
    assert raw.shape == (5, 4) and prev.shape == (4, 82, 67)
    # lead channels are constant planes with valid lead hours
    leads = sim[:, :, 24:28]
    assert (leads == leads[0, 0]).all()
    assert leads.min() >= 3 and leads.max() <= 51
    # batching via the loader
    loader = BatchLoader(ds, batch_size=2, num_workers=2)
    batch = next(iter(loader))
    assert batch[0].shape == (2, 82, 67, 140)
    assert sum(b.shape[0] for b in (x[0] for x in [batch])) == 2


@pytest.mark.skipif(not C.reference_available(),
                    reason="reference checkout not mounted")
def test_dataset_parity_vs_reference(tree):
    """Byte-level parity of the whole assembled sample tuple vs the
    reference ``Air_Simulation_Reanalysis_Dataset_only`` run on the same
    synthetic tree (torch reference, xarray shimmed)."""
    C.add_reference_to_path()
    import dataset as ref_dataset

    times = _times()
    feats, masks = _feats(times)
    kwargs = dict(input_dim=3, output_dim=2, prev_len=4, korea_stn_num=8,
                  china_stn_num=3, cmaq_size=(82, 67),
                  sim_data_path=tree["sim_data_path"],
                  reanalysis_data_path=tree["analysis_data_path"],
                  feat_infos=synthetic.DEFAULT_FEAT_INFOS)
    ours = AirSimulationReanalysisDatasetOnly(times, feats, masks, **kwargs)
    theirs = ref_dataset.Air_Simulation_Reanalysis_Dataset_only(
        times, feats, masks, 3, 2, 4, 8, 3, (82, 67),
        tree["sim_data_path"], tree["analysis_data_path"],
        synthetic.DEFAULT_FEAT_INFOS)
    assert len(ours) == len(theirs)
    for idx in (0, len(ours) - 1):
        a = ours[idx]
        b = [t.numpy() if hasattr(t, "numpy") else np.asarray(t)
             for t in theirs[idx]]
        names = ["simulation", "curr_reanalysis", "reanalysis",
                 "reanalysis_class", "raw_times", "prev_pm25"]
        for name, x, y in zip(names, a, b):
            np.testing.assert_allclose(
                np.asarray(x, dtype=np.float64),
                np.asarray(y, dtype=np.float64),
                rtol=1e-6, atol=1e-5, err_msg=f"{name}[{idx}]")


@pytest.mark.skipif(not C.reference_available(),
                    reason="reference checkout not mounted")
def test_dataset_v3_parity_vs_reference(tree):
    C.add_reference_to_path()
    import dataset as ref_dataset

    times = _times()
    feats, masks = _feats(times)
    ours = AirSimulationReanalysisDatasetV3(
        times, feats, masks, input_dim=3, output_dim=2, prev_len=4,
        korea_stn_num=8, china_stn_num=3, cmaq_size=(82, 67),
        sim_data_path=tree["sim_data_path"],
        reanalysis_data_path=tree["analysis_data_path"],
        feat_infos=synthetic.DEFAULT_FEAT_INFOS)
    theirs = ref_dataset.Air_Simulation_Reanalysis_Dataset_v3(
        times, feats, masks, 3, 2, 4, 8, 3, (82, 67),
        tree["sim_data_path"], tree["analysis_data_path"],
        synthetic.DEFAULT_FEAT_INFOS)
    a = ours[1]
    b = [t.numpy() if hasattr(t, "numpy") else np.asarray(t)
         for t in theirs[1]]
    for i, (x, y) in enumerate(zip(a, b)):
        np.testing.assert_allclose(np.asarray(x, dtype=np.float64),
                                   np.asarray(y, dtype=np.float64),
                                   rtol=1e-6, atol=1e-5, err_msg=str(i))


def test_air_only_dataset(tree):
    times = _times()
    feats, masks = _feats(times)
    ds = AirOnlyDataset(times, feats, masks, 3, 2, 4, 8, 3)
    feats_s, masks_s, cls, vals, mask, raw, prev = ds[0]
    assert feats_s.shape == (3, 11, 12)
    assert masks_s.shape == (5, 11) and masks_s.dtype == bool
    assert vals.shape == (2, 8) and cls.shape == (2, 8)
    assert prev.shape == (4, 11)


def test_loader_shuffle_and_order(tree):
    times = _times()
    feats, masks = _feats(times)
    ds = AirOnlyDataset(times, feats, masks, 3, 2, 4, 8, 3)
    ordered = BatchLoader(ds, batch_size=3, num_workers=2)
    n = sum(b[0].shape[0] for b in ordered)
    assert n == len(ds)
    shuffled = BatchLoader(ds, batch_size=3, shuffle=True, seed=1,
                           num_workers=2)
    n2 = sum(b[0].shape[0] for b in shuffled)
    assert n2 == len(ds)


def test_loader_batch_shuffle_mode(tree):
    """shuffle='batches': every index exactly once per epoch, batches are
    consecutive index runs (the union-assembly fast path) except the one
    wrap-around chunk, and the order re-randomizes across epochs."""
    times = _times()
    feats, masks = _feats(times)
    ds = AirOnlyDataset(times, feats, masks, 3, 2, 4, 8, 3)
    loader = BatchLoader(ds, batch_size=3, shuffle="batches", seed=1,
                         num_workers=2)
    epochs = []
    for _ in range(2):
        chunks = list(loader._batch_indices())
        flat = np.concatenate(chunks)
        assert sorted(flat.tolist()) == list(range(len(ds)))
        non_consecutive = sum(
            0 if np.all(np.diff(c) == 1) else 1 for c in chunks)
        assert non_consecutive <= 1          # only the wrap-around chunk
        epochs.append([c.tolist() for c in chunks])
        loader._epoch += 1
    assert epochs[0] != epochs[1]            # order changes across epochs
    # end-to-end: batches carry real samples
    n = sum(b[0].shape[0] for b in loader)
    assert n == len(ds)


def test_loader_buffer_shuffle_mode(tree):
    """shuffle='buffer': union-assembled source batches feed a reservoir;
    emitted batches draw random samples from it.  Every sample appears
    exactly once per epoch with bit-identical content, composition mixes
    beyond consecutive runs, and the stream is seed-deterministic."""
    times = _times()
    feats, masks = _feats(times)
    ds = AirOnlyDataset(times, feats, masks, 3, 2, 4, 8, 3)
    ref = {}                                   # sample key -> full tuple
    for i in range(len(ds)):
        s = ds[i]
        ref[s[0].tobytes() + s[5].tobytes()] = (i, s)

    def run_epoch(seed):
        loader = BatchLoader(ds, batch_size=3, shuffle="buffer", seed=seed,
                             num_workers=2, shuffle_buffer=3)
        out = []
        for batch in loader:
            for i in range(batch[0].shape[0]):
                out.append(tuple(np.array(f[i]) for f in batch))
        return out

    samples = run_epoch(seed=1)
    assert len(samples) == len(ds)
    seen_idx = []
    for s in samples:
        key = s[0].tobytes() + s[5].tobytes()
        assert key in ref, "emitted sample not in dataset"
        i, orig = ref[key]
        seen_idx.append(i)
        for f_out, f_ref in zip(s, orig):      # bit-identical content
            np.testing.assert_array_equal(f_out, np.asarray(f_ref))
    assert sorted(seen_idx) == list(range(len(ds)))   # exactly once each
    # mixing: emission order is not a rotation of consecutive index runs
    diffs = np.diff(seen_idx)
    assert np.sum(diffs != 1) > len(ds) // 4
    # determinism: same seed -> same stream
    again = [s[5].tobytes() for s in run_epoch(seed=1)]
    assert again == [s[5].tobytes() for s in samples]
    # drop_last applies at emission
    dropped = BatchLoader(ds, batch_size=3, shuffle="buffer", seed=1,
                          num_workers=2, shuffle_buffer=3, drop_last=True)
    counts = [b[0].shape[0] for b in dropped]
    assert all(c == 3 for c in counts)
    assert sum(counts) == len(ds) - len(ds) % 3


def test_remaining_dataset_variants(tree):
    """Shapes/contracts of the in-memory and image/station dataset variants."""
    from vit_grid_model_tpu.data.datasets import (
        AirSimulationReanalysisDataset, AirSimulationReanalysisDatasetByStn,
        AirSimulationReanalysisDatasetV2,
        AirSimulationReanalysisDatasetWithCurr,
        AirSimulationReanalysisDatasetWithStationImgs,
        AirWithFixedSatDataset, AirWithSimulationDataset,
        AirWithSimulationDatasetV2)

    times = _times()
    feats, masks = _feats(times)
    T, stn = len(times), 11
    rng = np.random.default_rng(1)

    # in-memory variants
    sim = rng.random((T, stn, 30), dtype=np.float32)
    re = rng.random((T, 82, 67), dtype=np.float32) * 60
    ds = AirSimulationReanalysisDataset(times, feats, masks, sim, re,
                                        3, 2, 4, 8, 3)
    f, m, s, r, c, rt, pv = ds[0]
    assert s.shape == (stn, 30) and r.shape == (2, 82, 67)
    ds = AirSimulationReanalysisDatasetWithCurr(times, feats, masks, sim, re,
                                                3, 2, 4, 8, 3)
    out = ds[0]
    assert out[3].shape == (82, 67)        # curr_reanalysis
    ds = AirWithFixedSatDataset(times, rng.random((T, stn, 2)),
                                rng.random((T, stn, 13)), feats, masks,
                                3, 2, 4, 8, 3)
    assert ds[0][2].shape == (stn, 2)
    ds = AirWithSimulationDataset(times, feats, masks, sim, 3, 2, 4, 8, 3)
    assert ds[0][2].shape == (stn, 30)
    ds = AirWithSimulationDatasetV2(times, feats, masks, sim,
                                    rng.random((T, stn)), 3, 2, 4, 8, 3)
    assert ds[0][3].shape == (stn,)

    # lazy v2 (output-window-only)
    kwargs = dict(input_dim=3, output_dim=2, prev_len=4, korea_stn_num=8,
                  china_stn_num=3, cmaq_size=(82, 67),
                  sim_data_path=tree["sim_data_path"],
                  reanalysis_data_path=tree["analysis_data_path"],
                  feat_infos=synthetic.DEFAULT_FEAT_INFOS)
    ds = AirSimulationReanalysisDatasetV2(times, feats, masks, **kwargs)
    assert ds[0][2].shape == (82, 67, 2 * 28)

    # by-station scoring variant: mask NOT inverted (``dataset.py:1889``)
    ds = AirSimulationReanalysisDatasetByStn(times, feats, masks, **kwargs)
    out = ds[0]
    vals, mask, cls = out[8], out[9], out[10]
    assert vals.shape == (2, 8) and mask.dtype == bool
    np.testing.assert_array_equal(
        mask, feats[3 + 1:3 + 3, :8, 6].astype(bool))

    # station-image variant (image fixtures)
    synthetic.write_station_images(tree["data_path"], times, output_dim=2)
    ds = AirSimulationReanalysisDatasetWithStationImgs(
        times, feats, masks, input_dim=3, output_dim=2, prev_len=4,
        korea_stn_num=8, china_stn_num=3, cmaq_size=(82, 67),
        sim_data_path=tree["sim_data_path"],
        reanalysis_data_path=tree["analysis_data_path"],
        data_path=tree["data_path"],
        feat_infos=synthetic.DEFAULT_FEAT_INFOS)
    out = ds[0]
    stn_inputs, multiair_out = out[6], out[7]
    assert stn_inputs.shape == (3, 2, 82, 67)
    assert multiair_out.shape == (2, 2, 82, 67)


def test_loader_early_abandon_does_not_hang(tree):
    """Abandoning the iterator mid-epoch must release the producer thread
    (review fix: stop-aware queue puts)."""
    import threading
    import time as _time

    times = _times()
    feats, masks = _feats(times)
    ds = AirOnlyDataset(times, feats, masks, 3, 2, 4, 8, 3)
    before = threading.active_count()
    for _ in range(5):
        it = iter(BatchLoader(ds, batch_size=1, num_workers=2,
                              prefetch_batches=1))
        next(it)
        it.close()
    deadline = _time.time() + 5.0
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= before + 1


def test_fault_injection_through_dataset(tree):
    """Dropping CMAQ cycle files end-to-end: the sample still assembles,
    with zero planes where files are missing (``dataset.py:784-789``)."""
    times = _times()
    feats, masks = _feats(times)
    ds = AirSimulationReanalysisDatasetOnly(
        times, feats, masks, input_dim=3, output_dim=2, prev_len=4,
        korea_stn_num=8, china_stn_num=3, cmaq_size=(82, 67),
        sim_data_path=tree["sim_data_path"],
        reanalysis_data_path=tree["analysis_data_path"],
        feat_infos=synthetic.DEFAULT_FEAT_INFOS)
    ds.use_native = False          # fault hook applies to the numpy reader
    readers.clear_caches()
    try:
        readers.set_fault_injection(lambda path: "03_" in path)
        sim, curr, re, cls, raw, prev = ds[0]
    finally:
        readers.set_fault_injection(None)
        readers.clear_caches()
    # the 03h-cycle species channels are zero-filled... but standardized:
    # (0 - mean)/std for the 5 standardized species, raw 0 for PM2.5
    pm25_03h = sim[:, :, 4]
    assert (pm25_03h == 0).all()
    co_mean, co_std = synthetic.DEFAULT_FEAT_INFOS["CO"]
    np.testing.assert_allclose(sim[:, :, 0], -co_mean / co_std, rtol=1e-5)
    # other cycles unaffected
    assert np.abs(sim[:, :, 6:12]).sum() > 0


def test_cycle_refs_invariants_hypothesis():
    """Property sweep over arbitrary datetimes (leap days, year/month
    rollovers): init + lead == valid time and lead >= 3 always hold."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.datetimes(min_value=datetime(1980, 1, 1),
                        max_value=datetime(2100, 12, 31)))
    def check(t):
        t = t.replace(minute=0, second=0, microsecond=0)
        for ref in TU.cycle_refs(t):
            init = datetime(ref.date.year, ref.date.month, ref.date.day,
                            ref.cycle)
            assert init + timedelta(hours=ref.lead) == t, (t, ref)
            assert 3 <= ref.lead <= 50

    check()


def test_batch_loader_dispatch_modes(tmp_path):
    """single-dispatch (native-plane) and pool modes produce identical
    batches in identical order; auto resolves via the dataset hint."""
    import pytest

    from vit_grid_model_tpu.data.pipeline import BatchLoader

    class Tiny:
        prefers_single_dispatch = True

        def __len__(self):
            return 10

        def __getitem__(self, i):
            return (np.full((3,), i, np.float32), np.int32(i))

    ds = Tiny()
    batches = {}
    for mode in ("single", "pool", "auto"):
        loader = BatchLoader(ds, batch_size=4, num_workers=2, dispatch=mode)
        batches[mode] = list(loader)
    for mode in ("pool", "auto"):
        for a, b in zip(batches["single"], batches[mode]):
            for x, y in zip(a, b):
                np.testing.assert_array_equal(x, y)
    assert BatchLoader(ds, batch_size=4)._single_dispatch()
    ds.prefers_single_dispatch = False
    assert not BatchLoader(ds, batch_size=4)._single_dispatch()
    with pytest.raises(ValueError, match="dispatch"):
        BatchLoader(ds, batch_size=4, dispatch="bogus")


def test_sim_stack_numpy_fallback_matches_native(tree):
    """sim_stack_to_model_input: the numpy fallback (native off / odd
    layouts) is byte-identical to the native gather, f32 and bf16."""
    import jax.numpy as jnp
    from vit_grid_model_tpu.data import native
    from vit_grid_model_tpu.data.assembly import sim_stack_to_model_input

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    sim = (rng.random((2, 9, 5, 3 * 28), np.float32) * 60) - 5
    sim.ravel()[:3] = [np.nan, np.inf, 257.0]      # cast specials
    for dtype in (np.float32, jnp.bfloat16):
        a = np.array(sim_stack_to_model_input(sim, 3, out_dtype=dtype))
        # Fortran-order input fails the native contiguity gate -> numpy path
        b = np.array(sim_stack_to_model_input(
            np.asfortranarray(sim).T.T, 3, out_dtype=dtype))
        fortran_took_native = native.repack_model_input_native(
            np.asfortranarray(sim), 3, np.empty_like(a))
        assert not fortran_took_native
        view = np.uint16 if dtype != np.float32 else np.float32
        np.testing.assert_array_equal(a.view(view), b.view(view),
                                      err_msg=str(dtype))


def test_batch_shuffle_engages_collated_fast_path(tree):
    """shuffle='batches' must actually hit get_batch_collated for every
    non-wrap batch — the fast path is the mode's entire point."""
    times = _times()
    feats, masks = _feats(times)
    from vit_grid_model_tpu.data.datasets import (
        AirSimulationReanalysisDatasetOnly)

    ds = AirSimulationReanalysisDatasetOnly(
        times, feats, masks, input_dim=2, output_dim=2, prev_len=3,
        korea_stn_num=4, china_stn_num=2, cmaq_size=(82, 67),
        sim_data_path=tree["sim_data_path"],
        reanalysis_data_path=tree["analysis_data_path"],
        feat_infos=synthetic.DEFAULT_FEAT_INFOS)
    calls = []
    orig = ds.get_batch_collated

    def spy(indices):
        out = orig(indices)
        calls.append(out is not None)
        return out

    ds.get_batch_collated = spy
    n = sum(b[0].shape[0] for b in
            BatchLoader(ds, batch_size=3, shuffle="batches", seed=2))
    assert n == len(ds)
    # every batch tried the fast path; at most wrap + ragged-tail missed
    assert len(calls) == (len(ds) + 2) // 3
    assert sum(calls) >= len(calls) - 2
