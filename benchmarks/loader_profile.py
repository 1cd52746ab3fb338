"""Where does the B=25 loader time go?  (round-3 verdict item 2)

The host loader drops 149.9 -> 69.2 samples/s steady between B=4 and B=25
(`benchmarks/data_pipeline.py`), exactly at the reference's eval geometry
(``evaluation_vit.py:138``).  This profiler splits one steady-state epoch of
``get_batch_collated`` batches into its components:

* ``native``   — the C++ two-phase staged gather (``vg_assemble_batch``);
* ``getitem``  — the per-sample ``__getitem__`` calls (reanalysis reads,
  class assignment) with the sim fields parked;
* ``rest``     — prevs means + np.stack of the small fields + loop glue.

Usage: PYTHONPATH=. python benchmarks/loader_profile.py [--days 8]
"""
from __future__ import annotations

import argparse
import json
import shutil
import time
from datetime import datetime, timedelta

import numpy as np

from tests import conftest as C  # noqa: F401  (CPU backend shims)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--days", type=int, default=8)
    ap.add_argument("--batches", type=str, default="4,25")
    args = ap.parse_args()

    from vit_grid_model_tpu.data import native, synthetic
    from vit_grid_model_tpu.data import timeutil as TU
    from vit_grid_model_tpu.data.datasets import (
        AirSimulationReanalysisDatasetOnly)

    root = "/tmp/vit_synth_loaderprof"
    shutil.rmtree(root, ignore_errors=True)
    start = datetime(2023, 1, 10, 0)
    end = start + timedelta(days=args.days) - timedelta(hours=1)
    tree = synthetic.generate_tree(root, start, end)
    times = TU.eval_time_list(start, end, 13, 12)
    rng = np.random.default_rng(0)
    feats = rng.random((len(times), 11, 12)).astype(np.float32)
    masks = np.ones((len(times), 11))
    ds = AirSimulationReanalysisDatasetOnly(
        times, feats, masks, input_dim=13, output_dim=12, prev_len=13,
        korea_stn_num=8, china_stn_num=3, cmaq_size=(82, 67),
        sim_data_path=tree["sim_data_path"],
        reanalysis_data_path=tree["analysis_data_path"],
        feat_infos=synthetic.DEFAULT_FEAT_INFOS)

    T = {"native": 0.0, "getitem": 0.0}
    orig_native = native.assemble_batch_native
    orig_getitem = ds.__class__.__getitem__

    def timed_native(*a, **k):
        t0 = time.perf_counter()
        r = orig_native(*a, **k)
        T["native"] += time.perf_counter() - t0
        return r

    def timed_getitem(self, i):
        t0 = time.perf_counter()
        r = orig_getitem(self, i)
        T["getitem"] += time.perf_counter() - t0
        return r

    native.assemble_batch_native = timed_native
    ds.__class__.__getitem__ = timed_getitem
    try:
        out = {"metric": "loader_profile", "days": args.days,
               "n_samples": len(ds)}
        for B in (int(b) for b in args.batches.split(",")):
            n_batches = len(ds) // B          # full batches only
            idx_sets = [list(range(s * B, (s + 1) * B))
                        for s in range(n_batches)]
            for epoch in (1, 2):              # epoch 1 warms pools/caches
                T["native"] = T["getitem"] = 0.0
                t0 = time.perf_counter()
                for idxs in idx_sets:
                    batch = ds.get_batch_collated(idxs)
                    assert batch is not None
                total = time.perf_counter() - t0
            n = n_batches * B
            out[f"b{B}"] = {
                "samples_per_s": round(n / total, 1),
                "ms_per_sample_total": round(total / n * 1e3, 2),
                "ms_per_sample_native": round(T["native"] / n * 1e3, 2),
                "ms_per_sample_getitem": round(T["getitem"] / n * 1e3, 2),
                "ms_per_sample_rest": round(
                    (total - T["native"] - T["getitem"]) / n * 1e3, 2)}
            print(f"# B={B}: {out[f'b{B}']}", flush=True)
        print(json.dumps(out))
    finally:
        native.assemble_batch_native = orig_native
        ds.__class__.__getitem__ = orig_getitem


if __name__ == "__main__":
    main()
