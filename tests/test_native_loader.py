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
