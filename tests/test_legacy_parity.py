"""Golden-activation parity for the legacy model family (``model.py``) and
SimVP/modules, vs the torch reference on CPU."""

import numpy as np
import pytest

from tests import conftest as C

pytestmark = pytest.mark.skipif(
    not C.reference_available(), reason="reference checkout not mounted")

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

C.add_reference_to_path()

from vit_grid_model_tpu.core import torch_import as TI  # noqa: E402


def _close(a, b, rel=1e-5):
    # Observed worst case across the whole legacy family is ~5e-7 rel
    # (f32 accumulation-order noise through the LSTM steps); 1e-5 keeps
    # 20x headroom while catching any real semantic drift.
    a, b = np.asarray(a), np.asarray(b)
    denom = np.abs(b).max() + 1e-9
    assert np.abs(a - b).max() / denom < rel, (
        f"max diff {np.abs(a - b).max():.3e} vs scale {denom:.3e}")


@pytest.fixture(autouse=True)
def _seed():
    torch.manual_seed(0)
    np.random.seed(0)


# ---------------------------------------------------------------------------
# components
# ---------------------------------------------------------------------------

def test_time_encode():
    import model as ref

    from vit_grid_model_tpu.models import normalizers as N

    te = ref.TimeEncode(dim=4)
    t = torch.rand(30) * 30
    with torch.no_grad():
        y_t = te(t)
    p = TI._time_encode({"e.w.weight": te.w.weight.detach().numpy(),
                         "e.w.bias": te.w.bias.detach().numpy()}, "e")
    y_j = N.time_encode(p, jnp.asarray(t.numpy()))
    _close(y_j, y_t.numpy())


def test_revin_modes_with_nan():
    import model as ref

    from vit_grid_model_tpu.models import normalizers as N

    rv = ref.RevIN(6, default_mean=20.0, default_std=10.0)
    torch.Tensor.cuda = lambda self, *a, **k: self
    x = torch.rand(3, 8, 6) * 40
    x[0, 2, 1] = float("nan")          # slice (0, :, 1) -> defaults
    rv._get_statistics(x)
    y = torch.rand(3, 5, 6) * 40
    with torch.no_grad():
        n_t = rv(y, "norm")
        d_t = rv(n_t, "denorm")
        d2_t = rv(n_t[:, :, :4], "denorm2")

    p = TI._revin({"r.affine_weight": rv.affine_weight.detach().numpy(),
                   "r.affine_bias": rv.affine_bias.detach().numpy()}, "r")
    stats = N.revin_statistics(jnp.asarray(x.numpy()), default_mean=20.0,
                               default_std=10.0)
    np.testing.assert_allclose(np.asarray(stats.mean), rv.mean.numpy(),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(stats.stdev), rv.stdev.numpy(),
                               rtol=1e-5)
    n_j = N.revin_norm(p, stats, jnp.asarray(y.numpy()))
    _close(n_j, n_t.numpy())
    _close(N.revin_denorm(p, stats, n_j), d_t.numpy())
    _close(N.revin_denorm2(p, stats, n_j[:, :, :4]), d2_t.numpy())


def test_dishts():
    import model as ref

    from vit_grid_model_tpu.models import normalizers as N

    dt = ref.DishTS(stn_num=6, prev_len=5)
    x = torch.rand(3, 5, 6) * 30
    with torch.no_grad():
        n_t = dt(x, None, "norm")
        d_t = dt(n_t, None, "denorm")
    p = TI._dishts({"d.reduce_mlayer": dt.reduce_mlayer.detach().numpy(),
                    "d.gamma": dt.gamma.detach().numpy(),
                    "d.beta": dt.beta.detach().numpy()}, "d")
    n_j, stats = N.dishts_norm(p, jnp.asarray(x.numpy()))
    _close(n_j, n_t.numpy())
    _close(N.dishts_denorm(p, stats, n_j), d_t.numpy())


def test_lstm_cell_and_mha():
    from vit_grid_model_tpu.ops import recurrent as R

    cell = torch.nn.LSTMCell(10, 16)
    x = torch.randn(4, 10)
    h = torch.randn(4, 16)
    c = torch.randn(4, 16)
    with torch.no_grad():
        h_t, c_t = cell(x, (h, c))
    p = TI._lstm({f"l.{k}": v.detach().numpy()
                  for k, v in cell.state_dict().items()}, "l")
    h_j, c_j = R.lstm_cell(p, jnp.asarray(x.numpy()), jnp.asarray(h.numpy()),
                           jnp.asarray(c.numpy()))
    _close(h_j, h_t.numpy())
    _close(c_j, c_t.numpy())

    mha = torch.nn.MultiheadAttention(16, 1)
    mha.eval()
    tokens = torch.randn(4, 7, 16)       # (B, N, E) ours; torch wants (N,B,E)
    mask = torch.zeros(4, 7, dtype=torch.bool)
    mask[0, 3:] = True                   # exclude some keys
    with torch.no_grad():
        out_t = mha(tokens.permute(1, 0, 2), tokens.permute(1, 0, 2),
                    tokens.permute(1, 0, 2), key_padding_mask=mask)[0]
    pm = TI._mha_params({f"m.{k}": v.detach().numpy()
                         for k, v in mha.state_dict().items()}, "m")
    out_j = R.mha_self_attention(pm, jnp.asarray(tokens.numpy()),
                                 key_padding_mask=jnp.asarray(mask.numpy()))
    _close(out_j, out_t.permute(1, 0, 2).numpy())


def test_categorical_to_continuous():
    import classification as ref

    from vit_grid_model_tpu.models.classification import categorical_to_continuous

    cats = torch.randint(0, 4, (5, 6))
    b = torch.tensor([15.0, 35.0, 75.0])
    ref_out = ref.categorical_to_continuous(cats, b)
    ours = categorical_to_continuous(jnp.asarray(cats.numpy()),
                                     [15.0, 35.0, 75.0])
    np.testing.assert_allclose(np.asarray(ours), ref_out.numpy())


def test_basic_conv2d_transpose():
    import modules as ref

    from vit_grid_model_tpu.ops import convblocks as CB

    m = ref.BasicConv2d(8, 8, kernel_size=3, stride=2, padding=1,
                        transpose=True, act_norm=True)
    m.eval()
    x = torch.randn(2, 8, 10, 11)
    with torch.no_grad():
        y_t = m(x)
    sd = {f"c.{k}": v.detach().numpy() for k, v in m.state_dict().items()}
    p = TI._basic_conv(sd, "c", transpose=True)
    y_j = CB.basic_conv2d(p, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                          stride=2, padding=1, transpose=True,
                          output_padding=1, act_norm=True)
    _close(np.asarray(y_j).transpose(0, 3, 1, 2), y_t.numpy())


# ---------------------------------------------------------------------------
# full legacy models
# ---------------------------------------------------------------------------

def _station_inputs(B, T_in, T_out, stn, feat_dim, prev_len):
    feats = torch.rand(B, T_in, stn, feat_dim) * 30
    masks = torch.rand(B, T_in + T_out, stn) > 0.2
    masks[0, 0] = False                   # a row with zero valid stations
    raw_times = torch.stack([
        torch.randint(1, 13, (B, T_in + T_out)).float(),
        torch.randint(1, 29, (B, T_in + T_out)).float(),
        torch.randint(0, 24, (B, T_in + T_out)).float(),
    ], dim=-1)
    prev_vals = torch.rand(B, prev_len, stn) * 30
    return feats, masks, raw_times, prev_vals


@pytest.mark.parametrize("method", ["DishTS", "RevIN", "Standard"])
def test_multiair(method):
    import model as ref

    from vit_grid_model_tpu.core.torch_import import convert_station_model
    from vit_grid_model_tpu.models.legacy.station import (
        StationModelSpec, station_model_apply)

    B, T_in, T_out, korea, china, fd, h = 2, 4, 3, 5, 2, 12, 64
    stn = korea + china
    lats = np.random.rand(stn) * 5 + 33
    lons = np.random.rand(stn) * 5 + 125
    tm = ref.MultiAir(input_dim=T_in, lats=lats, lons=lons, feat_dim=fd,
                      hidden_dim=h, pm25_mean=20.0, pm25_std=10.0,
                      output_dim=T_out, prev_len=T_in, korea_stn_num=korea,
                      china_stn_num=china, normalization_method=method)
    tm.eval()
    feats, masks, raw_times, prev_vals = _station_inputs(
        B, T_in, T_out, stn, fd, T_in)
    sat_outputs = torch.rand(B, stn, T_out) * 25
    sat_inputs = torch.rand(B, stn, 13)
    sat_inputs[sat_inputs < 0.1] = -1
    with torch.no_grad():
        y_t = tm(feats.clone(), masks, raw_times, prev_vals,
                 sat_outputs.clone(), sat_inputs.clone())

    spec = StationModelSpec(
        input_dim=T_in, feat_dim=fd, hidden_dim=h, pm25_mean=20.0,
        pm25_std=10.0, output_dim=T_out, prev_len=T_in,
        korea_stn_num=korea, china_stn_num=china,
        normalization_method=method, variant="multiair")
    p = convert_station_model(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()},
        "multiair", lats, lons)
    y_j = jax.jit(lambda pp, *a: station_model_apply(pp, spec, *a))(
        p, jnp.asarray(feats.numpy()), jnp.asarray(masks.numpy()),
        jnp.asarray(raw_times.numpy()), jnp.asarray(prev_vals.numpy()),
        jnp.asarray(sat_outputs.numpy()), jnp.asarray(sat_inputs.numpy()))
    assert y_j.shape == (B, korea, T_out)
    _close(y_j, y_t.numpy())


@pytest.mark.parametrize("variant,ref_name", [
    ("simulation", "simulation_model"),
    ("simulation_avg", "simulation_model_avg"),
    ("wo", "wo_simulation_model"),
])
def test_simulation_models(variant, ref_name):
    import model as ref

    from vit_grid_model_tpu.core.torch_import import convert_station_model
    from vit_grid_model_tpu.models.legacy.station import (
        StationModelSpec, station_model_apply)

    B, T_in, T_out, korea, china, fd, h = 2, 4, 3, 5, 2, 12, 64
    stn = korea + china
    lats = np.random.rand(stn) * 5 + 33
    lons = np.random.rand(stn) * 5 + 125
    cls = getattr(ref, ref_name)
    tm = cls(input_dim=T_in, lats=lats, lons=lons, feat_dim=fd,
             hidden_dim=h, pm25_mean=20.0, pm25_std=10.0, output_dim=T_out,
             prev_len=T_in, korea_stn_num=korea, china_stn_num=china)
    tm.eval()
    feats, masks, raw_times, prev_vals = _station_inputs(
        B, T_in, T_out, stn, fd, T_in)
    args_t = [feats.clone(), masks, raw_times, prev_vals]
    args_j = [jnp.asarray(feats.numpy()), jnp.asarray(masks.numpy()),
              jnp.asarray(raw_times.numpy()), jnp.asarray(prev_vals.numpy())]
    if variant == "simulation":
        sim = torch.rand(B, korea, T_out * (fd // 2) * 4 + 4) * 25
        args_t.append(sim.clone())
        kwargs_j = {"simulation": jnp.asarray(sim.numpy())}
    elif variant == "simulation_avg":
        sim = torch.rand(B, korea, T_out * (fd // 2) + 4) * 25
        args_t.append(sim.clone())
        kwargs_j = {"simulation": jnp.asarray(sim.numpy())}
    else:
        kwargs_j = {}
    with torch.no_grad():
        y_t = tm(*args_t)

    spec = StationModelSpec(
        input_dim=T_in, feat_dim=fd, hidden_dim=h, pm25_mean=20.0,
        pm25_std=10.0, output_dim=T_out, prev_len=T_in,
        korea_stn_num=korea, china_stn_num=china, variant=variant)
    p = convert_station_model(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()},
        variant, lats, lons)
    y_j = station_model_apply(p, spec, *args_j, **kwargs_j)
    assert y_j.shape == (B, korea, T_out)
    _close(y_j, y_t.numpy())


@pytest.mark.parametrize("version,ref_name,method", [
    (1, "simulation_grid_model", "Standard"),
    (2, "simulation_grid_model_v2", "Standard"),
    (3, "simulation_grid_model_v3", "Standard"),
    (3, "simulation_grid_model_v3", "RevIN"),
    (3, "simulation_grid_model_v3", "DishTS"),
])
def test_grid_models(version, ref_name, method):
    import model as ref

    from vit_grid_model_tpu.core.torch_import import convert_grid_model
    from vit_grid_model_tpu.models.legacy.grid import (GridModelSpec,
                                                       grid_model_apply)

    B, T_in, T_out, korea, china, fd, h = 1, 3, 2, 4, 2, 12, 32
    gh, gw = 6, 5
    stn = korea + china
    lats = np.random.rand(stn) * 5 + 33
    lons = np.random.rand(stn) * 5 + 125
    coords = np.random.rand(gh, gw, 2) * 10 + 30
    cls = getattr(ref, ref_name)
    tm = cls(input_dim=T_in, lats=lats, lons=lons, cmaq_coords=coords,
             feat_dim=fd, hidden_dim=h, pm25_mean=20.0, pm25_std=10.0,
             output_dim=T_out, prev_len=T_in, korea_stn_num=korea,
             china_stn_num=china, normalization_method=method)
    tm.eval()
    feats, masks, raw_times, _ = _station_inputs(B, T_in, T_out, stn, fd,
                                                 T_in)
    prev_vals = torch.rand(B, T_in, gh, gw) * 30
    sim = torch.rand(B, gh, gw, (T_in + T_out) * ((fd // 2) * 4 + 4)) * 25
    with torch.no_grad():
        y_t = tm(feats.clone(), masks, raw_times, prev_vals.clone(),
                 sim.clone())

    spec = GridModelSpec(
        input_dim=T_in, feat_dim=fd, hidden_dim=h, pm25_mean=20.0,
        pm25_std=10.0, output_dim=T_out, prev_len=T_in,
        korea_stn_num=korea, china_stn_num=china, grid_shape=(gh, gw),
        normalization_method=method, version=version)
    p = convert_grid_model(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()},
        version, lats, lons, coords)
    y_j = jax.jit(lambda pp, *a: grid_model_apply(pp, spec, *a))(
        p, jnp.asarray(feats.numpy()), jnp.asarray(masks.numpy()),
        jnp.asarray(raw_times.numpy()), jnp.asarray(prev_vals.numpy()),
        jnp.asarray(sim.numpy()))
    assert y_j.shape == (B, gh * gw, T_out)
    _close(y_j, y_t.numpy())


def test_simvp():
    import model as ref

    from vit_grid_model_tpu.core.torch_import import convert_simvp
    from vit_grid_model_tpu.models.simvp import (SimVPSpec, simvp_apply,
                                                 simvp_init)

    B, T, Cc, H, W = 1, 3, 2, 16, 16
    tm = ref.SimVP_adv(shape_in=(T, Cc, H, W), hid_S=8, hid_T=16, N_S=4,
                       N_T=4, groups=4)
    tm.eval()
    x = torch.randn(B, T, Cc, H, W)
    with torch.no_grad():
        y_t = tm(x)
    spec = SimVPSpec(shape_in=(T, Cc, H, W), hid_s=8, hid_t=16, n_s=4,
                     n_t=4, groups=4)
    p = convert_simvp({k: v.detach().numpy()
                       for k, v in tm.state_dict().items()}, n_s=4, n_t=4)
    y_j = jax.jit(lambda pp, xx: simvp_apply(pp, spec, xx))(
        p, jnp.asarray(x.numpy()))
    assert y_j.shape == (B, T, Cc, H, W)
    _close(y_j, y_t.numpy())
