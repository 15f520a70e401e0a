"""ArcFace IResNet flax implementation + torch-state_dict porter.

Oracle: a from-scratch torch IResNet following the public insightface
`arcface_torch` architecture (the community-standard "Deg" embedder the
reference README's Deg column implies — README.md:127; the reference ships
no implementation).  Random weights exported from the oracle must produce
matching embeddings through the ported flax net.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pgtformer_tpu.eval.arcface import (
    IResNet, IRESNET50_LAYERS, port_arcface_torch_weights, ArcFaceEmbedder)


def _torch_iresnet(layers, num_features=512):
    """Public arcface_torch iresnet architecture (torch oracle)."""
    import torch.nn as tnn

    class IBasicBlock(tnn.Module):
        def __init__(self, inplanes, planes, stride=1):
            super().__init__()
            self.bn1 = tnn.BatchNorm2d(inplanes, eps=1e-5)
            self.conv1 = tnn.Conv2d(inplanes, planes, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes, eps=1e-5)
            self.prelu = tnn.PReLU(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes, eps=1e-5)
            self.downsample = None
            if stride != 1 or inplanes != planes:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(inplanes, planes, 1, stride, bias=False),
                    tnn.BatchNorm2d(planes, eps=1e-5))

        def forward(self, x):
            out = self.bn3(self.conv2(self.prelu(
                self.bn2(self.conv1(self.bn1(x))))))
            idn = x if self.downsample is None else self.downsample(x)
            return out + idn

    class TorchIResNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 3, 1, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(64, eps=1e-5)
            self.prelu = tnn.PReLU(64)
            inplanes = 64
            for li, (planes, n) in enumerate(
                    zip((64, 128, 256, 512), layers), start=1):
                blocks = []
                for bi in range(n):
                    blocks.append(IBasicBlock(inplanes, planes,
                                              stride=2 if bi == 0 else 1))
                    inplanes = planes
                setattr(self, f"layer{li}", tnn.Sequential(*blocks))
            self.bn2 = tnn.BatchNorm2d(512, eps=1e-5)
            # 112/16 = 7 spatial after 4 stride-2 stages
            self.fc = tnn.Linear(512 * 7 * 7, num_features)
            self.features = tnn.BatchNorm1d(num_features, eps=1e-5)

        def forward(self, x):
            import torch
            x = self.prelu(self.bn1(self.conv1(x)))
            for li in range(1, 5):
                x = getattr(self, f"layer{li}")(x)
            x = self.bn2(x)
            x = torch.flatten(x, 1)
            return self.features(self.fc(x.float()))

    return TorchIResNet()


@pytest.fixture(scope="module")
def tiny_pair():
    import torch
    torch.manual_seed(7)
    layers = (1, 1, 1, 1)
    ref = _torch_iresnet(layers)
    # non-trivial running stats (fresh BN stats are degenerate 0/1)
    ref.train()
    with torch.no_grad():
        for _ in range(2):
            ref(torch.randn(4, 3, 112, 112))
    ref.eval()

    model = IResNet(layers=layers)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 112, 112, 3), jnp.float32))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = port_arcface_torch_weights(variables, sd)
    return ref, model, variables


def test_arcface_tiny_parity(tiny_pair):
    import torch
    ref, model, variables = tiny_pair
    x = np.random.default_rng(3).normal(
        size=(2, 112, 112, 3)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
    out = model.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                               atol=2e-3, rtol=1e-3)


def test_arcface_porter_strict(tiny_pair):
    """Porter consumes every tensor, fills every leaf, and fails loudly on
    missing / leftover / mis-shaped entries."""
    import torch
    ref, model, variables = tiny_pair
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    missing = dict(sd)
    missing.pop("fc.weight")
    with pytest.raises(KeyError):
        port_arcface_torch_weights(
            model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 112, 112, 3), jnp.float32)), missing)

    extra = dict(sd)
    extra["unexpected.weight"] = np.zeros(3, np.float32)
    with pytest.raises(KeyError):
        port_arcface_torch_weights(
            model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 112, 112, 3), jnp.float32)), extra)


@pytest.mark.slow
def test_arcface_iresnet50_shapes():
    """Full iresnet50 variable tree matches the released checkpoints' key
    inventory (state_dict round-trips through the strict porter)."""
    import torch
    torch.manual_seed(1)
    ref = _torch_iresnet(IRESNET50_LAYERS)
    model = IResNet(layers=IRESNET50_LAYERS)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 112, 112, 3), jnp.float32))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = port_arcface_torch_weights(variables, sd)
    out = model.apply(variables, jnp.zeros((1, 112, 112, 3), jnp.float32))
    assert out.shape == (1, 512)


def test_arcface_embedder_interface():
    """Embedder plugs into the Deg pipeline (random weights; warns)."""
    emb = ArcFaceEmbedder(layers=(1, 1, 1, 1), warn_random=False)
    assert emb.random_weights
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    e = emb(img)
    assert e.shape == (512,)
    # deterministic per-image
    np.testing.assert_allclose(e, emb(img), atol=0)
    # alignment path: detector provided
    det = lambda im: np.array([[20, 24], [44, 24], [32, 36],
                               [24, 46], [40, 46]], np.float64)
    emb2 = ArcFaceEmbedder(layers=(1, 1, 1, 1), detector=det,
                           warn_random=False)
    assert emb2(img).shape == (512,)
