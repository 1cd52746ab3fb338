"""Seed-locked golden regression values (no torch/reference needed).

Captured on the CPU backend at highest matmul precision; guards against
silent numerical drift between rounds when the reference checkout is not
mounted.  Regenerate with ``python tests/test_golden_values.py`` if an
INTENTIONAL numerics change lands (and say so in the commit).
"""

import numpy as np

import jax
import jax.numpy as jnp

from tests import conftest as C  # noqa: F401
from vit_grid_model_tpu.core.config import MetNet3Config
from vit_grid_model_tpu.models.metnet3 import metnet3_apply, metnet3_init


def _forward():
    cfg = MetNet3Config(window_size=3, n_variables=24, n_start_channels=16,
                        end_lead_time=2, pm25_mean=22.5, pm25_std=15.5,
                        n_heads=4, dim_head=4)
    params = metnet3_init(jax.random.PRNGKey(42), cfg)
    x = (jax.random.uniform(jax.random.PRNGKey(7), (1, 3, 24, 82, 67))
         * 50.0)
    ts = jnp.tile(jnp.asarray([2023.0, 2.0, 3.0, 4.0]), (1, 7, 1))
    return jax.jit(lambda p, a, b: metnet3_apply(p, a, b, cfg))(params, x, ts)


GOLDEN = np.asarray([
    46.540649414062500, 45.715396881103516, 35.001087188720703,
    42.666526794433594, 42.710960388183594, 29.046438217163086,
])


def test_metnet3_golden_values():
    y = np.asarray(_forward())
    got = np.asarray([y[0, 0, 0, 0], y[0, 0, 40, 30], y[0, 0, 81, 66],
                      y[0, 1, 0, 0], y[0, 1, 40, 30], y[0, 1, 81, 66]])
    np.testing.assert_allclose(got, GOLDEN, rtol=2e-4)


if __name__ == "__main__":
    y = np.asarray(_forward())
    got = [float(y[0, 0, 0, 0]), float(y[0, 0, 40, 30]),
           float(y[0, 0, 81, 66]), float(y[0, 1, 0, 0]),
           float(y[0, 1, 40, 30]), float(y[0, 1, 81, 66])]
    print("GOLDEN = np.asarray([")
    print("    " + ", ".join(f"{v:.15f}" for v in got[:3]) + ",")
    print("    " + ", ".join(f"{v:.15f}" for v in got[3:]) + ",")
    print("])")
