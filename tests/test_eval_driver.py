"""The full evaluation driver on synthetic data (CPU), checking the metric
engine against directly computed values for the same predictions."""

from datetime import datetime

import numpy as np
import pytest

import jax

from tests import conftest as C  # noqa: F401
from vit_grid_model_tpu.core.config import DataConfig, GridConfig, MetNet3Config
from vit_grid_model_tpu.data import readers, synthetic
from vit_grid_model_tpu.evaluation import driver
from vit_grid_model_tpu.models.metnet3 import metnet3_init


def test_evaluate_end_to_end(tmp_path):
    paths = synthetic.generate_tree(
        str(tmp_path), datetime(2023, 5, 1, 0), datetime(2023, 5, 1, 11),
        prev_len=3, output_dim=2, korea_stn_num=5, china_stn_num=2)
    readers.clear_caches()
    data_cfg = DataConfig(input_dim=2, output_dim=2, prev_len=3,
                          feat_dim=12, grid=GridConfig(),
                          data_path=paths["data_path"],
                          sim_data_path=paths["sim_data_path"],
                          analysis_data_path=paths["analysis_data_path"])
    model_cfg = MetNet3Config(window_size=4, n_variables=24,
                              n_start_channels=16, end_lead_time=2,
                              pm25_mean=22.5, pm25_std=15.5, n_heads=4,
                              dim_head=4)
    params = metnet3_init(jax.random.PRNGKey(1), model_cfg)
    metrics = driver.evaluate(
        params, model_cfg, data_cfg, model_name="drv_test",
        test_start=datetime(2023, 5, 1, 0), test_end=datetime(2023, 5, 1, 11),
        batch_size=4, log_dir=str(tmp_path / "logs"), progress=False)
    s = metrics.summary()
    # persistence on the smooth synthetic process must beat a random model
    assert s["persist"]["RMSE"] < s["model"]["RMSE"]
    assert 0.0 <= s["persist"]["ACC"] <= 1.0
    for name in ("model", "persist", "sim_21h", "sim_avg"):
        assert np.isfinite(s[name]["RMSE"])
        assert np.isfinite(s[name]["R"])
    # the log file exists with the reference's first scalar line
    log = (tmp_path / "logs" / "test_drv_test.log").read_text()
    assert "persist total ACC:" in log
    # per-lead tables have the right shapes
    t = metrics.lead_tables("model")
    assert t["CSI"].shape == (3 * 2,)


def _small_setup(tmp_path, hours=13):
    """Synthetic tree + configs shared by the data-parallel eval tests."""
    end = datetime(2023, 5, 1, hours)
    paths = synthetic.generate_tree(
        str(tmp_path), datetime(2023, 5, 1, 0), end,
        prev_len=3, output_dim=2, korea_stn_num=5, china_stn_num=2)
    readers.clear_caches()
    data_cfg = DataConfig(input_dim=2, output_dim=2, prev_len=3,
                          feat_dim=12, grid=GridConfig(),
                          data_path=paths["data_path"],
                          sim_data_path=paths["sim_data_path"],
                          analysis_data_path=paths["analysis_data_path"])
    model_cfg = MetNet3Config(window_size=4, n_variables=24,
                              n_start_channels=16, end_lead_time=2,
                              pm25_mean=22.5, pm25_std=15.5, n_heads=4,
                              dim_head=4)
    return data_cfg, model_cfg, end


def test_evaluate_data_parallel_matches_single(tmp_path):
    """The reference's one parallelism feature is DataParallel *evaluation*
    (``evaluation_vit.py:107``).  The mesh-sharded evaluate() must produce
    identical metrics to the single-device run — GSPMD computes the global
    program, so even the batch-mixing time-embedding quirk is preserved."""
    # 14 hourly times -> 10 samples: one full batch of 8 (sharded over the
    # 8-device CPU mesh) + a remainder batch of 2 (unsharded fallback path)
    data_cfg, model_cfg, end = _small_setup(tmp_path, hours=13)
    params = metnet3_init(jax.random.PRNGKey(1), model_cfg)

    kw = dict(test_start=datetime(2023, 5, 1, 0), test_end=end,
              batch_size=8, log_dir=str(tmp_path / "logs"), progress=False)
    single = driver.evaluate(params, model_cfg, data_cfg,
                             model_name="dp_single", **kw)

    from vit_grid_model_tpu.core.config import MeshConfig
    from vit_grid_model_tpu.parallel import mesh as meshlib

    mesh = meshlib.make_mesh(MeshConfig(data=8, model=1))
    assert mesh.shape["data"] == 8
    sharded = driver.evaluate(params, model_cfg, data_cfg,
                              model_name="dp_sharded", mesh=mesh, **kw)

    s1, s2 = single.summary(), sharded.summary()
    for name in ("model", "persist", "sim_21h", "sim_avg"):
        for metric in s1[name]:
            np.testing.assert_allclose(s1[name][metric], s2[name][metric],
                                       rtol=1e-6, err_msg=f"{name}/{metric}")
    np.testing.assert_array_equal(single.stats["model"].confusion,
                                  sharded.stats["model"].confusion)
    for key in ("CSI", "F1", "RMSE", "MAE"):
        np.testing.assert_allclose(single.lead_tables("model")[key],
                                   sharded.lead_tables("model")[key],
                                   rtol=1e-6)


def test_evaluate_nhwc_staging_matches_standard(tmp_path):
    """Fast-mode NHWC host staging (``MetNet3Config.nhwc_input`` +
    ``sim_stack_to_nhwc_input``) must produce BIT-IDENTICAL evaluation
    metrics to the standard bf16-staged (B,T,C,H,W) path — the relayout
    it removes is a pure permutation (tests/test_nhwc_input.py pins the
    model level; this pins the driver integration end to end)."""
    import dataclasses

    data_cfg, model_cfg, end = _small_setup(tmp_path, hours=13)
    model_cfg = dataclasses.replace(model_cfg, compute_dtype="bfloat16",
                                    fuse_lead_stem=True)
    params = metnet3_init(jax.random.PRNGKey(1), model_cfg)
    kw = dict(test_start=datetime(2023, 5, 1, 0), test_end=end,
              batch_size=4, log_dir=str(tmp_path / "logs"), progress=False)
    std = driver.evaluate(params, model_cfg, data_cfg,
                          model_name="nhwc_std", **kw)
    nhwc = driver.evaluate(
        params, dataclasses.replace(model_cfg, nhwc_input=True), data_cfg,
        model_name="nhwc_new", **kw)
    s1, s2 = std.summary(), nhwc.summary()
    for name in ("model", "persist", "sim_21h", "sim_avg"):
        for metric in s1[name]:
            np.testing.assert_array_equal(s1[name][metric], s2[name][metric],
                                          err_msg=f"{name}/{metric}")
    np.testing.assert_array_equal(std.stats["model"].confusion,
                                  nhwc.stats["model"].confusion)


def test_evaluate_pallas_mesh_ragged_bit_exact(tmp_path):
    """Round-3 verdict item 4: fast-mode (shard_mapped Pallas) mesh eval
    must equal single-device on a non-divisible sample count.  Previously
    the ragged final batch was padded with its own last sample, which
    perturbed REAL predictions through the batch-mixing time-embedding
    quirk (#11); now it runs unsharded at its true size
    (``parallel.mesh.UnshardedTail``)."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    from vit_grid_model_tpu.core.config import MeshConfig
    from vit_grid_model_tpu.parallel import mesh as meshlib

    # 10 hourly times -> 6 samples: one full batch of 4 (sharded over the
    # 4-device mesh) + a ragged batch of 2 (the tail path under test)
    data_cfg, model_cfg, end = _small_setup(tmp_path, hours=9)
    model_cfg = dataclasses.replace(model_cfg, use_pallas_attention=True)
    params = metnet3_init(jax.random.PRNGKey(1), model_cfg)
    kw = dict(test_start=datetime(2023, 5, 1, 0), test_end=end,
              batch_size=4, log_dir=str(tmp_path / "logs"), progress=False)

    with pltpu.force_tpu_interpret_mode():
        single = driver.evaluate(params, model_cfg, data_cfg,
                                 model_name="rg_single", **kw)

    mesh = meshlib.make_mesh(MeshConfig(data=4, model=1),
                             devices=jax.devices()[:4])
    cfg_sh = dataclasses.replace(model_cfg, pallas_shard_axis="data")
    with jax.set_mesh(mesh):
        with pltpu.force_tpu_interpret_mode():
            sharded = driver.evaluate(params, cfg_sh, data_cfg,
                                      model_name="rg_sharded", mesh=mesh,
                                      **kw)

    s1, s2 = single.summary(), sharded.summary()
    for name in ("model", "persist", "sim_21h", "sim_avg"):
        for metric in s1[name]:
            np.testing.assert_allclose(s1[name][metric], s2[name][metric],
                                       rtol=1e-6, err_msg=f"{name}/{metric}")
    np.testing.assert_array_equal(single.stats["model"].confusion,
                                  sharded.stats["model"].confusion)


def test_evaluate_full_fast_mesh_matches_single(tmp_path):
    """The COMPLETE production fast configuration on a mesh — bf16 +
    fused stem + shard_mapped Pallas attention + host-prepared NHWC
    staging + ragged tail — must bit-equal the single-device bf16+Pallas
    run with standard staging (what `--fast --data_parallel k` executes
    on real multi-chip hardware)."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    from vit_grid_model_tpu.core.config import MeshConfig
    from vit_grid_model_tpu.parallel import mesh as meshlib

    data_cfg, model_cfg, end = _small_setup(tmp_path, hours=9)
    model_cfg = dataclasses.replace(model_cfg, compute_dtype="bfloat16",
                                    fuse_lead_stem=True,
                                    use_pallas_attention=True)
    params = metnet3_init(jax.random.PRNGKey(1), model_cfg)
    kw = dict(test_start=datetime(2023, 5, 1, 0), test_end=end,
              batch_size=4, log_dir=str(tmp_path / "logs"), progress=False)

    with pltpu.force_tpu_interpret_mode():
        single = driver.evaluate(params, model_cfg, data_cfg,
                                 model_name="ff_single", **kw)

    mesh = meshlib.make_mesh(MeshConfig(data=4, model=1),
                             devices=jax.devices()[:4])
    cfg_sh = dataclasses.replace(model_cfg, pallas_shard_axis="data",
                                 nhwc_input=True)
    with jax.set_mesh(mesh):
        with pltpu.force_tpu_interpret_mode():
            sharded = driver.evaluate(params, cfg_sh, data_cfg,
                                      model_name="ff_sharded", mesh=mesh,
                                      **kw)

    s1, s2 = single.summary(), sharded.summary()
    for name in ("model", "persist", "sim_21h", "sim_avg"):
        for metric in s1[name]:
            np.testing.assert_array_equal(s1[name][metric], s2[name][metric],
                                          err_msg=f"{name}/{metric}")
    np.testing.assert_array_equal(single.stats["model"].confusion,
                                  sharded.stats["model"].confusion)


def test_evaluate_collects_valid_times_quirk19(tmp_path):
    """Quirk #19 (``evaluation_vit.py:285-289``): encoded YYYYMMDDHH of
    samples whose last input hour is 06, flag-gated."""
    data_cfg, model_cfg, end = _small_setup(tmp_path, hours=11)
    params = metnet3_init(jax.random.PRNGKey(1), model_cfg)
    metrics = driver.evaluate(
        params, model_cfg, data_cfg, model_name="q19",
        test_start=datetime(2023, 5, 1, 0), test_end=end,
        batch_size=4, log_dir=str(tmp_path / "logs"), progress=False,
        collect_valid_times=True)
    got = np.concatenate(metrics.valid_times)
    # samples are indexed by mod_idx = idx + prev_len - 1; last input hour
    # = times[mod_idx]; with 12 hourly times from 00 there are 8 samples
    # with last-input hours 02..09 -> exactly one has hour == 6
    assert got.tolist() == [2023050106]


def test_parity_report_gate(tmp_path):
    """The one-command parity gate (round-2 verdict item 8): evaluate, save
    the summary as a golden baseline, re-report against it (PASS, exact
    match), then against a perturbed baseline (FAIL beyond the 1e-3 RMSE
    gate) — the exact workflow the real-.pkt run will use."""
    import json

    from vit_grid_model_tpu.evaluation import parity

    data_cfg, model_cfg, end = _small_setup(tmp_path)
    params = metnet3_init(jax.random.PRNGKey(1), model_cfg)
    metrics = driver.evaluate(
        params, model_cfg, data_cfg, model_name="par_test",
        test_start=datetime(2023, 5, 1, 0), test_end=end,
        batch_size=4, log_dir=str(tmp_path / "logs"), progress=False)
    summary = metrics.summary()

    golden = str(tmp_path / "golden.json")
    parity.save_baseline(golden, summary)
    lines, ok = parity.parity_report(summary, parity.load_baseline(golden))
    assert ok, "\n".join(lines)
    assert any("GATE PASS" in ln for ln in lines)

    # perturb the golden RMSE beyond the tolerance -> gate fails
    bad = json.load(open(golden))
    bad["metrics"]["model"]["RMSE"] += 0.5
    lines, ok = parity.parity_report(summary, bad)
    assert not ok
    assert any("GATE FAIL" in ln for ln in lines)

    # the built-in reference table loads and gates (random weights on
    # synthetic data are nowhere near the shipped checkpoint -> FAIL)
    ref = parity.load_baseline("reference")
    assert ref["metrics"]["model"]["RMSE"] == 10.6697
    _, ok = parity.parity_report(summary, ref)
    assert not ok


def test_parity_report_cli_flags(tmp_path):
    """CLI wiring: --parity_save writes the golden; --parity_report exits 0
    on pass and 1 on failure."""
    import json

    import pytest

    from vit_grid_model_tpu.cli import evaluation_vit as cli

    root = str(tmp_path / "synth")
    common = ["--synthetic", "--synthetic_root", root,
              "--input_dim", "2", "--output_dim", "2", "--prev_len", "3",
              "--hidden_dim", "16", "--batch_size", "4",
              "--model_name", "par_cli",
              "--test_start", "2023-05-01T00", "--test_end", "2023-05-01T11",
              "--log_dir", str(tmp_path / "logs")]
    golden = str(tmp_path / "golden_cli.json")
    cli.main(common + ["--parity_save", golden])
    assert json.load(open(golden))["metrics"]["model"]["RMSE"] > 0
    # same deterministic run against its own golden: gate passes (exit 0)
    cli.main(common + ["--parity_report", golden])
    # perturbed golden: gate fails (exit 1)
    bad = json.load(open(golden))
    bad["metrics"]["model"]["RMSE"] += 1.0
    badpath = str(tmp_path / "bad.json")
    json.dump(bad, open(badpath, "w"))
    with pytest.raises(SystemExit) as e:
        cli.main(common + ["--parity_report", badpath])
    assert e.value.code == 1


def test_forecaster_serving_entry():
    """Persistent serving path: pre-cast params + donated input buffer
    produce the same fields as a plain forward (CPU, fast=False)."""
    from vit_grid_model_tpu.evaluation.serving import Forecaster
    from vit_grid_model_tpu.models.metnet3 import metnet3_apply

    cfg = MetNet3Config(window_size=3, n_variables=24, n_start_channels=16,
                        end_lead_time=2, pm25_mean=22.5, pm25_std=15.5,
                        n_heads=4, dim_head=4)
    params = metnet3_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = rng.random((1, 3, 24, 82, 67), dtype=np.float32) * 50
    ts = np.tile(np.asarray([2023., 1., 15., 6.], np.float32), (1, 7, 1))

    f = Forecaster(params, cfg, fast=False, warmup=1)
    got = f.predict(x, ts)
    assert got.shape == (1, 2, 82, 67) and np.isfinite(got).all()
    want = np.asarray(jax.jit(
        lambda p, a, b: metnet3_apply(p, a, b, cfg))(params, x, ts))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
    # repeated predicts reuse the compiled fn and device params
    got2 = f.predict(x, ts)
    np.testing.assert_allclose(got2, got, rtol=1e-6)
