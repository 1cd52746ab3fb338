"""Head-to-head execution of the ACTUAL reference ``evaluation(args)``
(``/root/reference/src/evaluation_vit.py:59-692``) against our evaluation
driver on one shared synthetic data tree and one twin checkpoint.

This closes the round-4 verification hole: until now the metric engine was
verified against a *transcription* of the reference's accumulations
(``tests/test_metrics.py``); a transcription error reproduced in both the
test and the implementation would be invisible.  Here the two systems run
end-to-end — reference torch eval loop vs our JAX driver — on identical
inputs and identical weights, and every scalar and table cell of the two
logs is diffed within 1e-3.

Harness patches applied to RUN the reference on this image (none change
numerics):

* the hardcoded 2023-Q1 window (``evaluation_vit.py:111-112``) is shrunk via
  a module-level ``datetime`` shim — the full quarter's ``.tolist()`` value
  collection (``:326-330``) needs tens of GB;
* ``torch.load``'s ``map_location=f'cuda:{...}'`` (``:109``) is forced to
  ``'cpu'`` (the original string is invalid off a CUDA box);
* ``DataLoader(num_workers=5)`` (``:138``) runs with ``num_workers=0``
  (same order: ``shuffle=False``) — the VM has one core;
* tqdm is pass-through and ``pdb.set_trace`` raises (non-interactive run);
* plus the standing conftest patches (``.cuda`` identity, xarray shim).
"""

import os
import re
import types
from datetime import datetime

import numpy as np
import pytest

from tests import conftest as C

pytestmark = [
    pytest.mark.skipif(not C.reference_available(),
                       reason="reference checkout not mounted"),
    # ~7 min on the 1-core host (runs by default: this is the whole-system
    # parity gate; deselect with -m 'not slow' for quick iterations)
    pytest.mark.slow,
]

torch = pytest.importorskip("torch")

import jax  # noqa: E402

C.add_reference_to_path()

from vit_grid_model_tpu.core.config import MetNet3Config  # noqa: E402
from vit_grid_model_tpu.core.torch_export import save_torch_checkpoint  # noqa: E402
from vit_grid_model_tpu.data import readers, synthetic  # noqa: E402
from vit_grid_model_tpu.models.metnet3 import metnet3_init  # noqa: E402

# small-but-structurally-faithful geometry: full 12-lead output (12-row
# tables like the shipped golden log), 3 batches incl. a ragged tail
INPUT_DIM = 4
OUTPUT_DIM = 12
PREV_LEN = 4
HIDDEN = 32
BATCH = 10
START = datetime(2023, 1, 1, 0)
END = datetime(2023, 1, 1, 23)          # 24 samples -> batches 10/10/4
MODEL_NAME = "h2h_model"

SCALAR_KEYS = ("total ACC", "total POD", "total FAR", "total F1 score",
               "MAE", "RMSE", "NMB", "NME", "R")
SCALAR_PREFIXES = ("persist", "model", "sim 21h", "sim avg")
TABLE_TITLES = ("persistance model", "MultiAir", "simulation 21h",
                "simulation avg")
TABLE_METRICS = ("CSI", "F1", "RMSE", "MAE")

_FLOAT = re.compile(r"^-?(\d+\.?\d*|\.\d+|inf|nan)$", re.IGNORECASE)


def _model_cfg():
    # mirrors cli.evaluation_vit.build_configs for these flags; n_heads /
    # dim_head stay at the shared defaults (32/32) exactly like the
    # reference constructor call (``evaluation_vit.py:106``)
    return MetNet3Config(
        window_size=INPUT_DIM + OUTPUT_DIM, n_variables=24,
        n_start_channels=HIDDEN, end_lead_time=OUTPUT_DIM,
        pm25_mean=synthetic.DEFAULT_FEAT_INFOS["PM2.5"][0],
        pm25_std=synthetic.DEFAULT_FEAT_INFOS["PM2.5"][1])


class _ShimDatetime(datetime):
    """Remaps only the hardcoded window end (``evaluation_vit.py:112``)."""

    def __new__(cls, *args, **kw):
        if args == (2023, 3, 31, 23):
            return datetime(END.year, END.month, END.day, END.hour)
        return datetime(*args, **kw)


def _run_reference(paths, workdir) -> str:
    import evaluation_vit as ref

    from _pytest.monkeypatch import MonkeyPatch

    mp = MonkeyPatch()
    try:
        mp.setattr(ref, "datetime", _ShimDatetime)
        real_load = torch.load

        def _load_cpu(*a, **kw):
            kw["map_location"] = "cpu"
            return real_load(*a, **kw)

        mp.setattr(torch, "load", _load_cpu)
        real_loader = ref.DataLoader

        def _inline_loader(*a, **kw):
            kw["num_workers"] = 0
            return real_loader(*a, **kw)

        mp.setattr(ref, "DataLoader", _inline_loader)
        mp.setattr(ref, "tqdm", lambda it, **kw: it)
        mp.setattr(ref, "pdb", types.SimpleNamespace(
            set_trace=lambda: (_ for _ in ()).throw(
                AssertionError("reference evaluation hit its NaN guard"))))
        mp.chdir(workdir)

        args = types.SimpleNamespace(
            seed=0, batch_size=BATCH, data_path=paths["data_path"],
            sim_data_path=paths["sim_data_path"],
            analysis_data_path=paths["analysis_data_path"],
            model_name=MODEL_NAME, gpus="cpu", hidden_dim=HIDDEN,
            output_dim=OUTPUT_DIM, input_dim=INPUT_DIM, prev_len=PREV_LEN,
            feat_dim=12, all_devices=None, default_device="cpu:0")
        ref.evaluation(args)
    finally:
        mp.undo()
    with open(os.path.join(workdir, "logs", f"test_{MODEL_NAME}.log")) as f:
        return f.read()


def _run_ours(paths, workdir, pkt) -> str:
    from vit_grid_model_tpu.cli import evaluation_vit as cli

    log_dir = os.path.join(workdir, "logs_ours")
    cli.main([
        "--seed", "0", "--batch_size", str(BATCH),
        "--data_path", paths["data_path"],
        "--sim_data_path", paths["sim_data_path"],
        "--analysis_data_path", paths["analysis_data_path"],
        "--model_name", MODEL_NAME, "--hidden_dim", str(HIDDEN),
        "--output_dim", str(OUTPUT_DIM), "--input_dim", str(INPUT_DIM),
        "--prev_len", str(PREV_LEN),
        "--checkpoint", pkt,
        "--test_start", START.strftime("%Y-%m-%dT%H"),
        "--test_end", END.strftime("%Y-%m-%dT%H"),
        "--log_dir", log_dir])
    with open(os.path.join(log_dir, f"test_{MODEL_NAME}.log")) as f:
        return f.read()


@pytest.fixture(scope="module")
def h2h_logs(tmp_path_factory):
    """Generate the tree, export the twin .pkt, run BOTH systems once."""
    root = tmp_path_factory.mktemp("h2h")
    workdir = str(root / "work")
    os.makedirs(os.path.join(workdir, "check_points"))
    os.makedirs(os.path.join(workdir, "logs"))

    paths = synthetic.generate_tree(str(root / "tree"), START, END,
                                    prev_len=PREV_LEN, output_dim=OUTPUT_DIM)
    readers.clear_caches()

    cfg = _model_cfg()
    params = metnet3_init(jax.random.PRNGKey(42), cfg)
    pkt = os.path.join(workdir, "check_points", f"{MODEL_NAME}.pkt")
    save_torch_checkpoint(params, cfg, pkt)

    ref_log = _run_reference(paths, workdir)
    ours_log = _run_ours(paths, workdir, pkt)
    return ref_log, ours_log


def _parse_scalars(text):
    out = {}
    for prefix in SCALAR_PREFIXES:
        for key in SCALAR_KEYS:
            line_prefix = f"{prefix} {key}: "
            hits = [ln[len(line_prefix):] for ln in text.splitlines()
                    if ln.startswith(line_prefix)]
            assert len(hits) == 1, f"scalar line {line_prefix!r}: {hits}"
            out[f"{prefix} {key}"] = float(hits[0])
    return out


def _parse_tables(text):
    """{title metric: (L, 3) array} parsed from the pandas table blocks."""
    lines = text.splitlines()
    out = {}
    for title in TABLE_TITLES:
        for metric in TABLE_METRICS:
            header = f"{title} {metric}:"
            idx = [i for i, ln in enumerate(lines) if ln == header]
            assert len(idx) == 1, f"table header {header!r}: {idx}"
            # column-header line, then OUTPUT_DIM rows of 'label v v v'
            rows = lines[idx[0] + 2: idx[0] + 2 + OUTPUT_DIM]
            vals = []
            for row in rows:
                toks = row.split()
                assert len(toks) == 4, f"{header} row {row!r}"
                vals.append([float(t) for t in toks[1:]])
            out[f"{title} {metric}"] = np.asarray(vals)
    return out


def _skeleton(text):
    """Per-line non-numeric token sequences, args line dropped — the log
    structure with every number (incl. NaN) erased."""
    lines = text.splitlines()[1:]
    return [tuple(t for t in ln.split() if not _FLOAT.match(t))
            for ln in lines]


def test_every_scalar_matches(h2h_logs):
    """All 36 summary scalars of the two logs agree within 1e-3 (printed at
    4 decimals; true diffs are ~1e-6-rel forward noise)."""
    ref, ours = map(_parse_scalars, h2h_logs)
    assert ref.keys() == ours.keys()
    for key in ref:
        a, b = ref[key], ours[key]
        assert abs(a - b) <= 1.1e-3, f"{key}: reference={a} ours={b}"


def test_every_table_cell_matches(h2h_logs):
    """All 16 per-lead tables (12 leads x 3 thresholds each) agree within
    1e-3 cell-by-cell; 0/0 cells must be NaN on BOTH sides."""
    ref, ours = map(_parse_tables, h2h_logs)
    assert ref.keys() == ours.keys()
    for key in ref:
        a, b = ref[key], ours[key]
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b),
                                      err_msg=f"{key}: NaN patterns differ")
        m = ~np.isnan(a)
        np.testing.assert_allclose(a[m], b[m], atol=1.1e-3, rtol=0,
                                   err_msg=key)


def test_log_structure_byte_matches(h2h_logs):
    """With every numeric token erased, the two logs are line-for-line
    identical — same labels, same table titles, same row/col names, same
    quirks (the 'persistance' typo, sim-avg integer row index)."""
    ref, ours = map(_skeleton, h2h_logs)
    assert ref == ours
