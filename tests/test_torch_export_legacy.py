"""Reverse conversion for the legacy model family and SimVP.

Same contract as ``tests/test_torch_export.py``, for
``export_station_model`` / ``export_grid_model`` / ``export_simvp``: the
exported dicts strict-load into the actual reference classes
(``model.py:251,395,865,1046,1250``, ``model.py:227``), the torch forward on
our randomly-initialized weights matches our forward, and export -> import
is the identity.
"""

import numpy as np
import pytest

from tests import conftest as C

pytestmark = pytest.mark.skipif(
    not C.reference_available(), reason="reference checkout not mounted")

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

C.add_reference_to_path()

from vit_grid_model_tpu.core import torch_export as TE  # noqa: E402
from vit_grid_model_tpu.core import torch_import as TI  # noqa: E402


def _close(a, b, rel=1e-4):
    a, b = np.asarray(a), np.asarray(b)
    denom = np.abs(b).max() + 1e-9
    np.testing.assert_array_less(np.abs(a - b).max() / denom, rel)


def _strict_load(tm, sd):
    missing, unexpected = tm.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in sd.items()}, strict=True)
    assert not missing and not unexpected


def _trees_equal(a, b):
    flat_a, tree_a = jax.tree.flatten(a)
    flat_b, tree_b = jax.tree.flatten(b)
    assert tree_a == tree_b
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _station_inputs(b, t_in, t_out, stn, fd, prev_len, seed=0):
    # same contract as tests/test_legacy_parity.py::_station_inputs
    rng = np.random.default_rng(seed)
    feats = (rng.random((b, t_in, stn, fd)) * 30).astype(np.float32)
    masks = rng.random((b, t_in + t_out, stn)) > 0.2
    raw_times = np.stack([
        rng.integers(1, 13, (b, t_in + t_out)).astype(np.float32),
        rng.integers(1, 29, (b, t_in + t_out)).astype(np.float32),
        rng.integers(0, 24, (b, t_in + t_out)).astype(np.float32),
    ], axis=-1)
    prev_vals = (rng.random((b, prev_len, stn)) * 30).astype(np.float32)
    return feats, masks, raw_times, prev_vals


@pytest.mark.parametrize("method", ["RevIN", "DishTS", "Standard"])
def test_multiair_export_strict_load_and_forward(method):
    import model as ref

    from vit_grid_model_tpu.models.legacy.station import (
        StationModelSpec, station_model_apply, station_model_init)

    B, T_in, T_out, korea, china, fd, h = 2, 4, 3, 5, 2, 12, 64
    stn = korea + china
    rng = np.random.default_rng(1)
    lats = rng.random(stn) * 5 + 33
    lons = rng.random(stn) * 5 + 125
    spec = StationModelSpec(
        input_dim=T_in, feat_dim=fd, hidden_dim=h, pm25_mean=20.0,
        pm25_std=10.0, output_dim=T_out, prev_len=T_in,
        korea_stn_num=korea, china_stn_num=china,
        normalization_method=method, variant="multiair")
    params = station_model_init(jax.random.PRNGKey(2), spec, lats, lons)
    sd = TE.export_station_model(params, "multiair")

    tm = ref.MultiAir(input_dim=T_in, lats=lats, lons=lons, feat_dim=fd,
                      hidden_dim=h, pm25_mean=20.0, pm25_std=10.0,
                      output_dim=T_out, prev_len=T_in, korea_stn_num=korea,
                      china_stn_num=china, normalization_method=method)
    _strict_load(tm, sd)
    tm.eval()

    feats, masks, raw_times, prev_vals = _station_inputs(
        B, T_in, T_out, stn, fd, T_in)
    sat_outputs = (np.random.default_rng(3)
                   .random((B, stn, T_out), np.float32) * 25)
    sat_inputs = np.random.default_rng(4).random((B, stn, 13), np.float32)
    sat_inputs[sat_inputs < 0.1] = -1
    with torch.no_grad():
        y_t = tm(torch.from_numpy(feats.copy()), torch.from_numpy(masks),
                 torch.from_numpy(raw_times), torch.from_numpy(prev_vals),
                 torch.from_numpy(sat_outputs.copy()),
                 torch.from_numpy(sat_inputs.copy()))
    y_j = station_model_apply(
        params, spec, jnp.asarray(feats), jnp.asarray(masks),
        jnp.asarray(raw_times), jnp.asarray(prev_vals),
        jnp.asarray(sat_outputs), jnp.asarray(sat_inputs))
    _close(y_j, y_t.numpy())

    _trees_equal(params, TI.convert_station_model(sd, "multiair",
                                                  lats, lons))


def test_simulation_model_export_round_trip():
    import model as ref

    from vit_grid_model_tpu.models.legacy.station import (
        StationModelSpec, station_model_init)

    T_in, T_out, korea, china, fd, h = 4, 3, 5, 2, 12, 64
    stn = korea + china
    rng = np.random.default_rng(5)
    lats, lons = rng.random(stn) * 5 + 33, rng.random(stn) * 5 + 125
    spec = StationModelSpec(
        input_dim=T_in, feat_dim=fd, hidden_dim=h, pm25_mean=20.0,
        pm25_std=10.0, output_dim=T_out, prev_len=T_in,
        korea_stn_num=korea, china_stn_num=china, variant="simulation")
    params = station_model_init(jax.random.PRNGKey(6), spec, lats, lons)
    sd = TE.export_station_model(params, "simulation")
    tm = ref.simulation_model(
        input_dim=T_in, lats=lats, lons=lons, feat_dim=fd, hidden_dim=h,
        pm25_mean=20.0, pm25_std=10.0, output_dim=T_out, prev_len=T_in,
        korea_stn_num=korea, china_stn_num=china)
    _strict_load(tm, sd)
    _trees_equal(params, TI.convert_station_model(sd, "simulation",
                                                  lats, lons))


@pytest.mark.parametrize("version,ref_name,method", [
    (1, "simulation_grid_model", "Standard"),
    (3, "simulation_grid_model_v3", "RevIN"),
    (3, "simulation_grid_model_v3", "DishTS"),
])
def test_grid_model_export_strict_load(version, ref_name, method):
    import model as ref

    from vit_grid_model_tpu.models.legacy.grid import (GridModelSpec,
                                                       grid_model_init)

    T_in, T_out, korea, china, fd, h = 3, 2, 4, 2, 12, 32
    gh, gw = 6, 5
    stn = korea + china
    rng = np.random.default_rng(7)
    lats, lons = rng.random(stn) * 5 + 33, rng.random(stn) * 5 + 125
    coords = rng.random((gh, gw, 2)) * 10 + 30
    spec = GridModelSpec(
        input_dim=T_in, feat_dim=fd, hidden_dim=h, pm25_mean=20.0,
        pm25_std=10.0, output_dim=T_out, prev_len=T_in,
        korea_stn_num=korea, china_stn_num=china, grid_shape=(gh, gw),
        normalization_method=method, version=version)
    params = grid_model_init(jax.random.PRNGKey(8), spec, lats, lons, coords)
    sd = TE.export_grid_model(params, version)
    tm = getattr(ref, ref_name)(
        input_dim=T_in, lats=lats, lons=lons, cmaq_coords=coords,
        feat_dim=fd, hidden_dim=h, pm25_mean=20.0, pm25_std=10.0,
        output_dim=T_out, prev_len=T_in, korea_stn_num=korea,
        china_stn_num=china, normalization_method=method)
    _strict_load(tm, sd)
    _trees_equal(params, TI.convert_grid_model(sd, version, lats, lons,
                                               coords))


def test_simvp_export_strict_load_and_forward():
    import model as ref

    from vit_grid_model_tpu.models.simvp import (SimVPSpec, simvp_apply,
                                                 simvp_init)

    B, T, Cc, H, W = 1, 3, 2, 16, 16
    spec = SimVPSpec(shape_in=(T, Cc, H, W), hid_s=8, hid_t=16, n_s=4,
                     n_t=4, groups=4)
    params = simvp_init(jax.random.PRNGKey(9), spec)
    sd = TE.export_simvp(params, n_s=4, n_t=4)
    tm = ref.SimVP_adv(shape_in=(T, Cc, H, W), hid_S=8, hid_T=16, N_S=4,
                       N_T=4, groups=4)
    _strict_load(tm, sd)
    tm.eval()

    x = np.random.default_rng(10).standard_normal(
        (B, T, Cc, H, W)).astype(np.float32)
    with torch.no_grad():
        y_t = tm(torch.from_numpy(x.copy()))
    y_j = jax.jit(lambda pp, xx: simvp_apply(pp, spec, xx))(
        params, jnp.asarray(x))
    _close(y_j, y_t.numpy())

    _trees_equal(params, TI.convert_simvp(sd, n_s=4, n_t=4))
