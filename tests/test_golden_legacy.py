"""Seed-locked golden values for the legacy model family (no reference
needed).  Guards the biggest parity surface between rounds when
/root/reference is absent.  Regenerate: ``python tests/test_golden_legacy.py``
(only with an intentional numerics change, noted in the commit)."""

import numpy as np

import jax
import jax.numpy as jnp

from tests import conftest as C  # noqa: F401
from vit_grid_model_tpu.models.legacy.grid import (GridModelSpec,
                                                   grid_model_apply,
                                                   grid_model_init)
from vit_grid_model_tpu.models.legacy.station import (StationModelSpec,
                                                      station_model_apply,
                                                      station_model_init)
from vit_grid_model_tpu.models.simvp import (SimVPSpec, simvp_apply,
                                             simvp_init)


def _station_io(seed=0, B=1, T_in=3, T_out=2, stn=6, fd=12, prev=3):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.random((B, T_in, stn, fd), dtype=np.float32) * 30),
            jnp.asarray(rng.random((B, T_in + T_out, stn)) > 0.2),
            jnp.asarray(np.stack([rng.integers(1, 13, (B, T_in + T_out)),
                                  rng.integers(1, 29, (B, T_in + T_out)),
                                  rng.integers(0, 24, (B, T_in + T_out))],
                                 -1).astype(np.float32)),
            jnp.asarray(rng.random((B, prev, stn), dtype=np.float32) * 30))


def _multiair():
    spec = StationModelSpec(input_dim=3, feat_dim=12, hidden_dim=32,
                            pm25_mean=20.0, pm25_std=10.0, output_dim=2,
                            prev_len=3, korea_stn_num=4, china_stn_num=2,
                            normalization_method="Standard",
                            variant="multiair")
    rng = np.random.default_rng(1)
    p = station_model_init(jax.random.PRNGKey(11), spec,
                           rng.random(6) * 5 + 33, rng.random(6) * 5 + 125)
    feats, masks, raw, prev = _station_io()
    sat_out = jnp.asarray(rng.random((1, 6, 2), dtype=np.float32) * 25)
    sat_in = jnp.asarray(rng.random((1, 6, 13), dtype=np.float32))
    y = station_model_apply(p, spec, feats, masks, raw, prev,
                            sat_outputs=sat_out, sat_inputs=sat_in)
    return np.asarray(y)


def _grid_v3():
    spec = GridModelSpec(input_dim=3, feat_dim=12, hidden_dim=32,
                         pm25_mean=20.0, pm25_std=10.0, output_dim=2,
                         prev_len=3, korea_stn_num=4, china_stn_num=2,
                         grid_shape=(6, 5), version=3)
    rng = np.random.default_rng(2)
    p = grid_model_init(jax.random.PRNGKey(12), spec,
                        rng.random(6) * 5 + 33, rng.random(6) * 5 + 125,
                        rng.random((6, 5, 2)) * 10 + 30)
    feats, masks, raw, _ = _station_io(seed=2)
    prev = jnp.asarray(rng.random((1, 3, 6, 5), dtype=np.float32) * 30)
    sim = jnp.asarray(rng.random((1, 6, 5, 5 * 28), dtype=np.float32) * 25)
    y = grid_model_apply(p, spec, feats, masks, raw, prev, sim)
    return np.asarray(y)


def _simvp():
    spec = SimVPSpec(shape_in=(2, 2, 8, 8), hid_s=4, hid_t=8, n_s=2, n_t=2,
                     groups=2)
    p = simvp_init(jax.random.PRNGKey(13), spec)
    x = jax.random.normal(jax.random.PRNGKey(14), (1, 2, 2, 8, 8))
    return np.asarray(simvp_apply(p, spec, x))


GOLDEN_MULTIAIR = np.asarray([0.03160768747329712, 0.0, 0.0])
GOLDEN_GRID_V3 = np.asarray([23.466651916503906, 23.797752380371094,
                             20.08287239074707])
GOLDEN_SIMVP = np.asarray([0.013666868209838867, -0.018036752939224243,
                           0.14849776029586792])


def test_multiair_golden():
    y = _multiair()
    got = np.asarray([y[0, 0, 0], y[0, 2, 1], y[0, 3, 0]])
    np.testing.assert_allclose(got, GOLDEN_MULTIAIR, rtol=2e-4,
                               atol=1e-7)


def test_grid_v3_golden():
    y = _grid_v3()
    got = np.asarray([y[0, 0, 0], y[0, 15, 1], y[0, 29, 0]])
    np.testing.assert_allclose(got, GOLDEN_GRID_V3, rtol=2e-4)


def test_simvp_golden():
    y = _simvp()
    got = np.asarray([y[0, 0, 0, 0, 0], y[0, 1, 1, 4, 4], y[0, 0, 1, 7, 7]])
    np.testing.assert_allclose(got, GOLDEN_SIMVP, rtol=2e-4, atol=1e-6)


if __name__ == "__main__":
    ma, gv, sv = _multiair(), _grid_v3(), _simvp()
    print("GOLDEN_MULTIAIR =", [float(ma[0, 0, 0]), float(ma[0, 2, 1]),
                                float(ma[0, 3, 0])])
    print("GOLDEN_GRID_V3 =", [float(gv[0, 0, 0]), float(gv[0, 15, 1]),
                               float(gv[0, 29, 0])])
    print("GOLDEN_SIMVP =", [float(sv[0, 0, 0, 0, 0]), float(sv[0, 1, 1, 4, 4]),
                             float(sv[0, 0, 1, 7, 7])])
