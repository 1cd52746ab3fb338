"""Golden-activation parity vs the reference torch implementation.

Each test builds the reference module with random torch weights, converts its
state_dict through ``core.torch_import``, runs both on the same input and
asserts float-epsilon agreement.  This is the checkpoint-conversion parity
harness of SURVEY.md §7 step 3: when the real ``simulation_vit_model_12hr.pkt``
blob is present the identical code path loads it.

Skipped wholesale when the reference checkout is unavailable.
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


def _assert_close(a, b, rel=1e-4):
    a, b = np.asarray(a), np.asarray(b)
    denom = np.abs(b).max() + 1e-9
    np.testing.assert_array_less(np.abs(a - b).max() / denom, rel)


@pytest.fixture(autouse=True)
def _seed():
    torch.manual_seed(0)
    np.random.seed(0)


def test_conv_transpose_2x():
    from vit_grid_model_tpu.core import torch_import as TI
    from vit_grid_model_tpu.ops import nn as vnn

    ct = torch.nn.ConvTranspose2d(8, 5, 2, stride=2)
    x = torch.randn(2, 8, 6, 7)
    with torch.no_grad():
        y_t = ct(x)
    p = {"w": TI._conv_transpose(ct.weight.detach().numpy()),
         "b": TI._vec(ct.bias.detach().numpy())}
    y_j = vnn.conv2d_transpose(p, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    _assert_close(np.asarray(y_j).transpose(0, 3, 1, 2), y_t.numpy())


def test_relative_position_indices():
    import maxvit as ref_maxvit

    from vit_grid_model_tpu.ops.window import relative_position_indices

    attn = ref_maxvit.Attention(dim=32, cond_dim=2, heads=4, dim_head=8,
                                window_size=7, num_registers=4)
    ours = relative_position_indices(7, 4)
    np.testing.assert_array_equal(np.asarray(ours),
                                  attn.rel_pos_indices.numpy())


def test_attention():
    import maxvit as ref_maxvit

    from vit_grid_model_tpu.core.torch_import import _attention
    from vit_grid_model_tpu.ops.attention import attention
    from vit_grid_model_tpu.ops.window import relative_position_indices

    attn = ref_maxvit.Attention(dim=32, cond_dim=2, heads=4, dim_head=8,
                                window_size=7, num_registers=4)
    attn.eval()
    x = torch.randn(6, 53, 32)
    cond = torch.randn(3, 2)
    with torch.no_grad():
        y_t = attn(x, cond)
    sd = {"a." + k: v.detach().numpy() for k, v in attn.state_dict().items()}
    p = _attention(sd, "a")
    y_j = attention(p, jnp.asarray(x.numpy()), jnp.asarray(cond.numpy()),
                    relative_position_indices(7, 4), heads=4,
                    windows_per_sample=2)
    _assert_close(y_j, y_t.numpy())


@pytest.mark.parametrize("downsample", [True, False])
def test_mbconv(downsample):
    import maxvit as ref_maxvit

    from vit_grid_model_tpu.core.torch_import import _mbconv
    from vit_grid_model_tpu.ops.mbconv import mbconv

    mb = ref_maxvit.MBConv(16, 16, downsample=downsample)
    mb.eval()
    x = torch.randn(2, 16, 14, 14)
    with torch.no_grad():
        y_t = mb(x)
    sd = {"m." + k: v.detach().numpy() for k, v in mb.state_dict().items()}
    p = _mbconv(sd, "m")
    y_j = mbconv(p, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                 dim_in=16, dim_out=16, downsample=downsample)
    _assert_close(np.asarray(y_j).transpose(0, 3, 1, 2), y_t.numpy())


def test_maxvit_backbone():
    import maxvit as ref_maxvit

    from vit_grid_model_tpu.core.torch_import import _maxvit
    from vit_grid_model_tpu.models.maxvit import MaxViTSpec, maxvit_apply

    mv = ref_maxvit.MaxViT(dim=16, depth=1, cond_dim=2, heads=4, dim_head=4,
                           vit_window_size=7, num_register_tokens=4)
    mv.eval()
    x = torch.randn(2, 16, 14, 21)
    cond = torch.randn(2, 2)
    with torch.no_grad():
        y_t = mv(x, cond)
    sd = {"v." + k: v.detach().numpy() for k, v in mv.state_dict().items()}
    p = _maxvit(sd, "v", 1)
    spec = MaxViTSpec(dim=16, depth=(1,), cond_dim=2, heads=4, dim_head=4,
                      window_size=7, num_register_tokens=4)
    fwd = jax.jit(lambda pp, xx, cc: maxvit_apply(pp, xx, cc, spec))
    y_j = fwd(p, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
              jnp.asarray(cond.numpy()))
    _assert_close(np.asarray(y_j).transpose(0, 3, 1, 2), y_t.numpy())


def _random_timestamps(b, t):
    return torch.stack([
        torch.full((b, t), 2023.0),
        torch.randint(1, 13, (b, t)).float(),
        torch.randint(1, 29, (b, t)).float(),
        torch.randint(0, 24, (b, t)).float(),
    ], dim=-1)


def test_metnet3_full_forward():
    """End-to-end MetNet3 parity through every §2.4 quirk: in-forward PM
    standardization, repeat-interleave lead expansion, pad-14, row-6
    timestamps, the dim-0 time-embedding concat, FiLM resnets, MaxViT, the
    never-applied attention scale, and output de-standardization."""
    import metnet3 as ref_metnet3

    from vit_grid_model_tpu.core.config import MetNet3Config
    from vit_grid_model_tpu.core.torch_import import convert_metnet3_state_dict
    from vit_grid_model_tpu.models.metnet3 import metnet3_apply

    B, T, Cc, H, W, L = 2, 25, 24, 82, 67, 3
    tm = ref_metnet3.MetNet3(
        input_size_sample=(T, Cc, H, W), n_start_channels=16,
        end_lead_time=L, pm25_boundaries=[15, 35, 75],
        pm10_boundaries=[15, 35, 75], pm25_mean=17.5, pm25_std=12.3,
        n_heads=4, dim_head=4)
    tm.eval()
    x = torch.rand(B, T, Cc, H, W) * 50.0
    ts = _random_timestamps(B, T)
    with torch.no_grad():
        y_t = tm(x, timestamps=ts)

    cfg = MetNet3Config(window_size=T, n_variables=Cc, n_start_channels=16,
                        end_lead_time=L, pm25_mean=17.5, pm25_std=12.3,
                        n_heads=4, dim_head=4)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_metnet3_state_dict(sd, cfg)
    fwd = jax.jit(lambda p, xx, tt: metnet3_apply(p, xx, tt, cfg))
    y_j = fwd(params, jnp.asarray(x.numpy()), jnp.asarray(ts.numpy()))
    assert y_j.shape == (B, L, H, W)
    _assert_close(y_j, y_t.numpy())


def test_metnet3_with_stn_imgs_forward():
    """The station-image variant additionally standardizes channel 24
    (``metnet3.py:701``)."""
    import metnet3 as ref_metnet3

    from vit_grid_model_tpu.core.config import MetNet3Config
    from vit_grid_model_tpu.core.torch_import import convert_metnet3_state_dict
    from vit_grid_model_tpu.models.metnet3 import metnet3_apply

    B, T, Cc, H, W, L = 1, 25, 25, 82, 67, 2
    tm = ref_metnet3.MetNet3_with_stn_imgs(
        input_size_sample=(T, Cc, H, W), n_start_channels=16,
        end_lead_time=L, pm25_boundaries=[15, 35, 75],
        pm10_boundaries=[15, 35, 75], pm25_mean=17.5, pm25_std=12.3,
        n_heads=4, dim_head=4)
    tm.eval()
    x = torch.rand(B, T, Cc, H, W) * 50.0
    x_np = x.numpy().copy()   # the reference mutates ch 24 in place (:701)
    ts = _random_timestamps(B, T)
    with torch.no_grad():
        y_t = tm(x, timestamps=ts)

    cfg = MetNet3Config(window_size=T, n_variables=Cc, n_start_channels=16,
                        end_lead_time=L, pm25_mean=17.5, pm25_std=12.3,
                        n_heads=4, dim_head=4, stn_img_channel=24)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_metnet3_state_dict(sd, cfg)
    fwd = jax.jit(lambda p, xx, tt: metnet3_apply(p, xx, tt, cfg))
    y_j = fwd(params, jnp.asarray(x_np), jnp.asarray(ts.numpy()))
    _assert_close(y_j, y_t.numpy())
