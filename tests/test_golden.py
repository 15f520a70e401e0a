"""Frozen-golden regression: a fixed deterministic model + input must keep
producing the same outputs (catches silent numeric drift without needing
the torch oracle). Golden values recorded on 2026-08-16 (jax 0.9, CPU
fp32); loosened to 1e-4 to tolerate compiler fusion-order changes.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import traverse_util

from tests.test_train import SMALL_PGT
from pgtformer_tpu.models.pgtformer import PGTFormer

GOLDEN = {
    "out_mean": -0.02372459,
    "out_std": 0.02926759,
    "logits_mean": 0.00123813,
    "logits_std": 0.03315963,
    "lq_mean": -0.00182104,
    "codes_sum": 16128,
}

# exact output slices (a mean-preserving localized regression cannot slip
# past these the way it could the statistics above)
GOLDEN_SLICES = {
    "out[1, 8, 8:16, 0]": [-0.0407108, -0.0476009, -0.0493488, -0.0511725,
                           -0.030732, -0.0372859, -0.0420328, -0.0346445],
    "logits[0, 4, 4, 0, :8]": [0.0734313, 0.0239397, -0.0228866, 0.0054694,
                               -0.0122528, 0.0328317, -0.01549, -0.0052193],
    "lq[2, 16, 3:9, 5]": [0.0502385, 0.0415644, 0.0477406, 0.0425017,
                          0.0432611, 0.0449567],
    "codes[1, 7, :12, 0]": [21] * 12,
}


pytestmark = pytest.mark.quick


def _deterministic_variables(mod, x):
    shapes = jax.eval_shape(
        lambda: mod.init({"params": jax.random.PRNGKey(0)}, x, w=1.0))
    rng = np.random.default_rng(1234)
    flat = traverse_util.flatten_dict(shapes)
    out = {}
    for path, s in flat.items():
        leaf = str(path[-1])
        if leaf == "var":
            out[path] = jnp.ones(s.shape, s.dtype)
        elif leaf == "mean":
            out[path] = jnp.zeros(s.shape, s.dtype)
        elif np.issubdtype(s.dtype, np.floating):
            out[path] = jnp.asarray(
                rng.standard_normal(s.shape).astype(np.float32) * 0.05)
        else:
            out[path] = jnp.zeros(s.shape, s.dtype)
    return traverse_util.unflatten_dict(out)


def test_frozen_golden_outputs():
    mod = PGTFormer(SMALL_PGT)
    x = jnp.asarray(np.random.default_rng(99)
                    .uniform(0, 1, (1, 3, 32, 32, 3)).astype(np.float32))
    variables = _deterministic_variables(mod, x)
    out, logits, lq = mod.apply(variables, x, w=1.0)
    np.testing.assert_allclose(float(out.mean()), GOLDEN["out_mean"],
                               atol=1e-4)
    np.testing.assert_allclose(float(out.std()), GOLDEN["out_std"],
                               atol=1e-4)
    np.testing.assert_allclose(float(logits.mean()), GOLDEN["logits_mean"],
                               atol=1e-4)
    np.testing.assert_allclose(float(logits.std()), GOLDEN["logits_std"],
                               atol=1e-4)
    np.testing.assert_allclose(float(lq.mean()), GOLDEN["lq_mean"],
                               atol=1e-4)
    assert int(jnp.argmax(logits, -1).sum()) == GOLDEN["codes_sum"]

    np.testing.assert_allclose(np.asarray(out[1, 8, 8:16, 0], np.float64),
                               GOLDEN_SLICES["out[1, 8, 8:16, 0]"], atol=2e-5)
    np.testing.assert_allclose(np.asarray(logits[0, 4, 4, 0, :8], np.float64),
                               GOLDEN_SLICES["logits[0, 4, 4, 0, :8]"],
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(lq[2, 16, 3:9, 5], np.float64),
                               GOLDEN_SLICES["lq[2, 16, 3:9, 5]"], atol=2e-5)
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(logits, -1)[1, 7, :12, 0]),
        GOLDEN_SLICES["codes[1, 7, :12, 0]"])
