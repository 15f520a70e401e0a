"""ArcFace identity embedder (IResNet-50) for metric-grade Deg.

The reference reports the identity-degradation metric "Deg" (README.md:127)
but ships no implementation; the community standard is the cosine angle
between ArcFace embeddings of pred/GT faces (insightface `arcface_torch`,
`iresnet50` backbone, 112x112 aligned crops).  This module provides:

  * a flax IResNet (inference path: BatchNorm running stats, per-channel
    PReLU) matching the public `arcface_torch` architecture;
  * a strict porter for its torch state_dict (`port_arcface_torch_weights`)
    — drop in any released `backbone.pth` (e.g. ms1mv3_arcface_r50) for
    paper-comparable Deg;
  * :class:`ArcFaceEmbedder` — the pluggable embedder for
    eval/landmarks.face_metrics_frame: optional 5-point alignment to the
    canonical ArcFace 112x112 template, then the IResNet forward.

Without a checkpoint the net runs RANDOMLY INITIALIZED (loud warning):
Deg stays computable but is NOT paper-comparable (eval_cli labels the
column accordingly).
"""

from __future__ import annotations

import functools
import re
from typing import Any, Callable, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

# canonical ArcFace 112x112 5-point template (public insightface constant:
# eyes, nose tip, mouth corners)
ARC_TEMPLATE_112 = np.array([
    [38.2946, 51.6963],
    [73.5318, 51.5014],
    [56.0252, 71.7366],
    [41.5493, 92.3655],
    [70.7299, 92.2041],
], np.float64)

IRESNET50_LAYERS = (3, 4, 14, 3)
IRESNET18_LAYERS = (2, 2, 2, 2)


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(num_parameters=C))."""
    features: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25),
                           (self.features,), jnp.float32)
        a = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


def _bn(name: str):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                        momentum=0.9, name=name)


class IBasicBlock(nn.Module):
    """pre-BN residual block: bn-conv-bn-prelu-conv(stride)-bn (+1x1 skip)."""
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        out = _bn("bn1")(x)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      name="conv1")(out)
        out = _bn("bn2")(out)
        out = PReLU(self.planes, name="prelu")(out)
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, name="conv2")(out)
        out = _bn("bn3")(out)
        if self.stride != 1 or x.shape[-1] != self.planes:
            idn = nn.Conv(self.planes, (1, 1), strides=self.stride,
                          use_bias=False, name="downsample_conv")(x)
            idn = _bn("downsample_bn")(idn)
        else:
            idn = x
        return out + idn


class IResNet(nn.Module):
    """ArcFace IResNet backbone: [N, 112, 112, 3] in [-1, 1] -> [N, 512].

    `layers`: blocks per stage (IRESNET50_LAYERS for iresnet50)."""
    layers: tuple = IRESNET50_LAYERS
    num_features: int = 512

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (3, 3), padding=1, use_bias=False, name="conv1")(x)
        x = _bn("bn1")(x)
        x = PReLU(64, name="prelu")(x)
        for li, (planes, n_blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers), start=1):
            for bi in range(n_blocks):
                x = IBasicBlock(planes, stride=2 if bi == 0 else 1,
                                name=f"layer{li}_{bi}")(x)
        x = _bn("bn2")(x)
        N, H, W, C = x.shape
        # torch flattens NCHW (channel-major); keep that element order so
        # the ported fc kernel applies verbatim
        x = x.transpose(0, 3, 1, 2).reshape(N, C * H * W)
        x = nn.Dense(self.num_features, name="fc")(x.astype(jnp.float32))
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         momentum=0.9, name="features")(x)
        return x


def port_arcface_torch_weights(variables, sd: Dict[str, np.ndarray],
                               strict: bool = True):
    """Port an insightface `arcface_torch` backbone state_dict (torch keys
    `conv1/bn1/prelu/layer{l}.{i}.../bn2/fc/features`) into IResNet
    variables.  Strict: every flax leaf must be filled and every torch
    tensor consumed (buffers `num_batches_tracked` excepted)."""
    from flax import traverse_util
    from flax.core import unfreeze

    flat = traverse_util.flatten_dict(unfreeze(variables))
    consumed = set()

    def torch_key(path):
        # ("params"|"batch_stats", module..., leaf) -> torch dotted key
        col, *mods, leaf = path
        name = ".".join(mods)
        name = name.replace("downsample_conv", "downsample.0")
        name = name.replace("downsample_bn", "downsample.1")
        name = re.sub(r"layer(\d)_(\d+)", r"layer\1.\2", name)
        leaf_map = {"kernel": "weight", "scale": "weight", "bias": "bias",
                    "mean": "running_mean", "var": "running_var",
                    "alpha": "weight"}
        return (name + "." if name else "") + leaf_map[leaf]

    for path, val in list(flat.items()):
        tk = torch_key(path)
        if tk not in sd:
            if strict:
                raise KeyError(f"torch checkpoint missing {tk} for {path}")
            continue
        v = np.asarray(sd[tk])
        leaf = path[-1]
        if leaf == "kernel":
            v = v.transpose(2, 3, 1, 0) if v.ndim == 4 else v.T
        if v.shape != tuple(np.shape(val)):
            raise ValueError(f"shape mismatch for {tk}: checkpoint "
                             f"{v.shape} vs model {np.shape(val)}")
        flat[path] = jnp.asarray(v)
        consumed.add(tk)
    if strict:
        leftovers = [k for k in sd
                     if k not in consumed
                     and not k.endswith("num_batches_tracked")]
        if leftovers:
            raise KeyError(f"unconsumed torch tensors: {leftovers[:10]} "
                           f"(+{max(0, len(leftovers) - 10)} more)")
    return traverse_util.unflatten_dict(flat)


@functools.lru_cache(maxsize=2)
def _default_variables_cache(layers: tuple):
    model = IResNet(layers=layers)
    variables = model.init(jax.random.PRNGKey(2024),
                           jnp.zeros((1, 112, 112, 3), jnp.float32))
    return model, variables


class ArcFaceEmbedder:
    """Pluggable identity embedder for Deg (eval/landmarks.py interface).

    `weights_path`: torch `backbone.pth` state_dict of the matching
    iresnet; without it the net is RANDOM (warns; eval_cli labels the
    column `deg(random-arcface)`).
    `detector`: optional 5-point landmark detector — when given, faces are
    similarity-aligned to the ArcFace 112x112 template before embedding
    (standard ArcFace protocol); otherwise the (already face-centric VFHQ)
    frame is resized to 112.
    """

    def __init__(self, weights_path: Optional[str] = None,
                 detector: Optional[Callable] = None,
                 layers: tuple = IRESNET50_LAYERS,
                 torch_state_dict: Optional[Dict[str, np.ndarray]] = None,
                 warn_random: bool = True):
        model, variables = _default_variables_cache(tuple(layers))
        if weights_path:
            from pgtformer_tpu.convert.torch_port import load_torch_checkpoint
            torch_state_dict = load_torch_checkpoint(weights_path,
                                                     param_key=None)
        if torch_state_dict is not None:
            variables = port_arcface_torch_weights(variables,
                                                   torch_state_dict)
        elif warn_random:
            import sys
            print("WARNING: ArcFace embedder running with RANDOM weights — "
                  "'deg' is NOT paper-comparable. Drop in an insightface "
                  "arcface_torch backbone.pth via --arcface-weights "
                  "(see BASELINE.md).", file=sys.stderr)
        self.random_weights = torch_state_dict is None
        self.detector = detector
        self._fwd = jax.jit(lambda v, x: model.apply(v, x))
        self._variables = variables

    def _crop(self, img: np.ndarray) -> np.ndarray:
        import cv2
        if self.detector is not None:
            lm = np.asarray(self.detector(img), np.float64)
            m = cv2.estimateAffinePartial2D(lm, ARC_TEMPLATE_112,
                                            method=cv2.LMEDS)[0]
            if m is not None:
                return cv2.warpAffine(img, m, (112, 112),
                                      borderMode=cv2.BORDER_REPLICATE)
        return cv2.resize(img, (112, 112), interpolation=cv2.INTER_AREA)

    def __call__(self, img: np.ndarray) -> np.ndarray:
        """img [H, W, 3] float in [0, 1] -> embedding [512]."""
        face = self._crop(np.asarray(img, np.float32))
        x = (face - 0.5) / 0.5
        emb = self._fwd(self._variables, jnp.asarray(x)[None])
        return np.asarray(emb)[0]
