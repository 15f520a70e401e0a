"""Standalone-submodule checkpoint porting (e.g. a separate BiSeNet
face-parse checkpoint into `conditionnet`)."""

import numpy as np
import jax
import jax.numpy as jnp

from pgtformer_tpu.models.parser import BiSeNet
from pgtformer_tpu.convert.torch_port import port_subtree
from tests.conftest import torch_state_dict_to_numpy


def test_port_standalone_bisenet_into_conditionnet(reference):
    import torch
    import flax.linen as nn

    class Wrapper(nn.Module):
        """Stands in for PGTFormer: parser lives under `conditionnet`."""
        @nn.compact
        def __call__(self, x):
            h = BiSeNet(19, name="conditionnet")(x)
            return nn.Dense(4, name="head")(h)

    torch.manual_seed(51)
    ref = reference.pgtformer.BiSeNet(19)
    ref.eval()
    rng = np.random.default_rng(51)
    x = jnp.asarray(rng.normal(size=(1, 512, 512, 3)).astype(np.float32))

    mod = Wrapper()
    variables = mod.init(jax.random.PRNGKey(0), x)
    variables = port_subtree(variables, "conditionnet",
                             torch_state_dict_to_numpy(ref))

    parser = BiSeNet(19)
    sub_vars = {col: tree["conditionnet"] for col, tree in variables.items()
                if "conditionnet" in tree}
    out = parser.apply(sub_vars, x)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(
            np.ascontiguousarray(np.asarray(x).transpose(0, 3, 1, 2))))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(),
        atol=5e-4, rtol=1e-3)
