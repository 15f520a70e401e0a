"""Test harness.

* Forces JAX onto CPU with 8 virtual devices (multi-chip sharding tests run
  on a simulated mesh, per the reference-project test strategy in SURVEY.md §4).
* Provides `reference` fixtures that import the UNTRUSTED read-only PyTorch
  reference at /root/reference as a *numeric oracle* (never as code we ship),
  with tiny stubs for its unavailable deps (timm / basicsr / torchvision).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# the axon TPU-tunnel plugin ignores JAX_PLATFORMS; force CPU via config
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

import types
import numpy as np
import pytest


REFERENCE_ROOT = "/root/reference"


def _install_reference_stubs():
    """Install minimal stand-ins for the reference's missing deps."""
    import torch
    import torch.nn as tnn

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        timm_layers = types.ModuleType("timm.models.layers")

        def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            return tnn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)

        class DropPath(tnn.Module):
            def __init__(self, drop_prob=0.0):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):
                return x

        timm_layers.trunc_normal_ = trunc_normal_
        timm_layers.DropPath = DropPath
        timm_models.layers = timm_layers
        timm.models = timm_models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
        sys.modules["timm.models.layers"] = timm_layers

    if "basicsr" not in sys.modules:
        basicsr = types.ModuleType("basicsr")
        archs = types.ModuleType("basicsr.archs")
        utils = types.ModuleType("basicsr.utils")
        registry = types.ModuleType("basicsr.utils.registry")

        class _Registry:
            def register(self, obj=None, **kw):
                if obj is None:
                    return lambda o: o
                return obj

        archs.ARCH_REGISTRY = _Registry()
        registry.ARCH_REGISTRY = _Registry()
        registry.DATASET_REGISTRY = _Registry()

        import logging

        def get_root_logger(*a, **k):
            return logging.getLogger("reference")

        utils.get_root_logger = get_root_logger
        utils.registry = registry
        basicsr.archs = archs
        basicsr.utils = utils
        sys.modules["basicsr"] = basicsr
        sys.modules["basicsr.archs"] = archs
        sys.modules["basicsr.utils"] = utils
        sys.modules["basicsr.utils.registry"] = registry

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        transforms = types.ModuleType("torchvision.transforms")

        class Compose:
            def __init__(self, ts):
                self.ts = ts

            def __call__(self, x):
                for t in self.ts:
                    x = t(x)
                return x

        class Normalize:
            def __init__(self, mean, std):
                self.mean = torch.tensor(mean).view(-1, 1, 1)
                self.std = torch.tensor(std).view(-1, 1, 1)

            def __call__(self, x):
                return (x - self.mean.to(x.dtype)) / self.std.to(x.dtype)

        transforms.Compose = Compose
        transforms.Normalize = Normalize
        tv.transforms = transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = transforms


@pytest.fixture(scope="session")
def reference():
    """Namespace of reference torch modules (CPU), used as a numeric oracle."""
    _install_reference_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import torch
    torch.manual_seed(0)
    ns = types.SimpleNamespace()
    from modules import rstt_layers
    from archs import tdcrqvae3_arch, codeformer_arch, vqgan_arch, pgtformer_arch
    ns.rstt_layers = rstt_layers
    ns.tdcrqvae3 = tdcrqvae3_arch
    ns.codeformer = codeformer_arch
    ns.vqgan = vqgan_arch
    ns.pgtformer = pgtformer_arch
    return ns


def torch_state_dict_to_numpy(module) -> dict:
    # .copy() matters: torch's EMA codebooks mutate in place, and jnp.asarray
    # on CPU may alias the shared numpy buffer
    return {k: v.detach().cpu().numpy().copy()
            for k, v in module.state_dict().items()}


@pytest.fixture(scope="session")
def to_numpy_sd():
    return torch_state_dict_to_numpy
