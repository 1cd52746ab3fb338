"""CLI: station-wise evaluation of the grid model.

Completes the reference's ``Air_Simulation_Reanalysis_Dataset_by_stn``
workflow (``dataset.py:1833-2219`` — the dataset ships with no consumer):
run the MetNet3 forward over the test window, sample the predicted PM2.5
fields at the stations' grid coordinates, score against the ground
observations with their validity flags, and append a reference-style metric
block to ``logs/test_{model_name}_by_stn.log``.

Flag surface mirrors the grid-eval CLI (``evaluation_vit.py:694-721``);
the data flags are identical so a grid-eval invocation converts to a
station eval by swapping the module name.
"""

from __future__ import annotations

import os
from datetime import datetime


def build_parser():
    from vit_grid_model_tpu.cli import evaluation_vit as ev

    p = ev.build_parser()
    p.description = "station-wise evaluation (by_stn workflow)"
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if args.gpus == "cpu":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax

    if args.gpus == "cpu":
        jax.config.update("jax_platforms", "cpu")
        if any(d.platform != "cpu" for d in jax.devices()):
            raise RuntimeError("--gpus cpu requested but the CPU backend "
                               "could not be selected")
    import numpy as np

    from vit_grid_model_tpu.cli.evaluation_vit import load_model_params
    from vit_grid_model_tpu.core.config import (DataConfig, GridConfig,
                                                MetNet3Config)
    from vit_grid_model_tpu.evaluation import driver as eval_driver
    from vit_grid_model_tpu.evaluation.station_eval import (
        evaluate_by_station, write_station_log)

    np.random.seed(args.seed)
    test_start = datetime.fromisoformat(args.test_start)
    test_end = datetime.fromisoformat(args.test_end)

    if args.synthetic:
        from vit_grid_model_tpu.data import synthetic

        paths = synthetic.generate_tree(
            args.synthetic_root, test_start, test_end,
            prev_len=args.prev_len, output_dim=args.output_dim)
        args.data_path = paths["data_path"]
        args.sim_data_path = paths["sim_data_path"]
        args.analysis_data_path = paths["analysis_data_path"]

    data_cfg = DataConfig(
        input_dim=args.input_dim, output_dim=args.output_dim,
        prev_len=args.prev_len, feat_dim=args.feat_dim, grid=GridConfig(),
        data_path=args.data_path, sim_data_path=args.sim_data_path,
        analysis_data_path=args.analysis_data_path)

    feat_infos = eval_driver.load_feat_infos(args.data_path)
    if args.fast:
        args.compute_dtype = "bfloat16"
        args.precision = "default"
    model_cfg = MetNet3Config(
        window_size=args.input_dim + args.output_dim, n_variables=24,
        n_start_channels=args.hidden_dim, end_lead_time=args.output_dim,
        pm25_mean=feat_infos["PM2.5"][0], pm25_std=feat_infos["PM2.5"][1],
        compute_dtype=args.compute_dtype, fuse_lead_stem=args.fast,
        use_pallas_attention=args.fast)

    params = load_model_params(args, model_cfg)
    print(f"devices: {jax.devices()}")
    print(args)

    metrics = evaluate_by_station(
        params, model_cfg, data_cfg, test_start=test_start,
        test_end=test_end, batch_size=args.batch_size,
        num_workers=args.num_workers, matmul_precision=args.precision,
        max_batches=args.max_batches)

    name = (args.model_name or "model") + "_by_stn"
    os.makedirs(args.log_dir, exist_ok=True)
    with open(os.path.join(args.log_dir, f"test_{name}.log"), "a") as f:
        write_station_log(f, metrics, str(args))
    s = metrics.summary()
    print("station RMSE: {:.4f}  MAE: {:.4f}  R: {:.4f}  n_obs: {}".format(
        s["RMSE"], s["MAE"], s["R"], s["n_obs"]))


if __name__ == "__main__":
    main()
