"""LPIPS perceptual distance in JAX (VGG16 backbone + linear calibration).

The reference uses the private fork's `LPIPSLoss` / `TemporalLPIPSLoss`
(options/...stage_IIII...yml:195-198) built on the standard `lpips` package.
This is a from-scratch flax implementation of the same architecture:

  input in [0,1] -> [-1,1] -> per-channel scaling -> VGG16 features at
  relu{1_2, 2_2, 3_3, 4_3, 5_3} -> channel-unit-normalize -> squared diff
  -> 1x1 non-negative linear head -> spatial mean -> sum over layers.

Pretrained VGG16 + lin weights can be ported from a torch checkpoint via
`port_lpips_torch_weights` (the standard `lpips` package state_dict layout).
When no checkpoint is available (this image has no network egress), a
deterministic randomly-initialized VGG is used: random-feature perceptual
distances still correlate with perceptual similarity and keep the training
recipe runnable; swap in real weights for metric-grade numbers.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

# VGG16 conv plan: (out_channels | 'M' for maxpool)
_VGG16_PLAN = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512)
# indices (into conv counter) after which LPIPS taps features: relu1_2 ... relu5_3
_TAP_AFTER_CONV = (2, 4, 7, 10, 13)
_TAP_CHANNELS = (64, 128, 256, 512, 512)

# lpips package ScalingLayer constants
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 trunk emitting the five LPIPS tap activations."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        taps = []
        conv_i = 0
        for item in _VGG16_PLAN:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(item, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv_{conv_i}")(x)
                x = jax.nn.relu(x)
                conv_i += 1
                if conv_i in _TAP_AFTER_CONV:
                    taps.append(x)
        return tuple(taps)


class LPIPS(nn.Module):
    """LPIPS distance head.  __call__(x, y): [N,H,W,3] in [0,1] -> [N]."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        shift = jnp.asarray(_SHIFT, self.dtype)
        scale = jnp.asarray(_SCALE, self.dtype)

        def prep(im):
            im = 2.0 * im - 1.0
            return (im - shift) / scale

        vgg = VGG16Features(dtype=self.dtype, name="vgg")
        fx = vgg(prep(x))
        fy = vgg(prep(y))

        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            lin = self.param(f"lin_{i}", nn.initializers.ones,
                             (_TAP_CHANNELS[i],), jnp.float32)
            # non-negative 1x1 head (lpips uses a Dropout+Conv1x1; weights >= 0)
            w = jnp.abs(lin).astype(d.dtype)
            total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
        return total


@functools.lru_cache(maxsize=2)
def _default_variables_cache(dtype_name: str):
    model = LPIPS(dtype=jnp.dtype(dtype_name).type)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.dtype(dtype_name))
    return model, model.init(jax.random.PRNGKey(1234), dummy, dummy)


def make_lpips_fn(torch_state_dict: Optional[Dict[str, np.ndarray]] = None,
                  dtype=jnp.float32, weights_path: Optional[str] = None,
                  warn_random: bool = True):
    """Return lpips_fn(x, y) -> per-sample distances [N].

    `torch_state_dict`: optional `lpips.LPIPS(net='vgg')` state_dict to port;
    `weights_path`: .pth/.safetensors file holding that state_dict.
    Without either, the VGG runs RANDOMLY INITIALIZED — usable as a training
    prior but NOT metric-grade; a loud warning is emitted unless suppressed.
    """
    if weights_path:
        from pgtformer_tpu.convert.torch_port import load_torch_checkpoint
        torch_state_dict = load_torch_checkpoint(weights_path, param_key=None)
    model, variables = _default_variables_cache(jnp.dtype(dtype).name)
    if torch_state_dict is not None:
        variables = port_lpips_torch_weights(variables, torch_state_dict)
    elif warn_random:
        import sys
        print("WARNING: LPIPS running with RANDOM VGG weights — training "
              "perceptual loss is a random-feature prior and eval 'lpips' "
              "numbers are NOT comparable to published values. Drop in the "
              "`lpips.LPIPS(net='vgg')` state_dict via weights_path/"
              "--lpips-weights for metric-grade LPIPS (see BASELINE.md).",
              file=sys.stderr)

    def lpips_fn(x, y):
        return model.apply(variables, x, y)

    lpips_fn.random_weights = torch_state_dict is None
    return lpips_fn


def port_lpips_torch_weights(variables, sd: Dict[str, np.ndarray]):
    """Port the `lpips` package's VGG16 + lin state_dict.

    Torch keys: `net.slice{k}.{idx}.weight/bias` (VGG convs, sequential
    indices) and `lin{i}.model.1.weight` ([1, C, 1, 1] non-negative heads).
    """
    from flax.core import unfreeze
    from flax import traverse_util

    v = unfreeze(variables)
    flat = traverse_util.flatten_dict(v)

    # VGG convs appear in slice order; rebuild the sequential index mapping
    conv_entries = []
    for k in sorted(sd):
        if k.endswith(".weight") and ".slice" in k:
            conv_entries.append(k[:-7])
    # torchvision VGG features indices are monotonically increasing per slice
    conv_entries.sort(key=lambda s: (int(s.split("slice")[1].split(".")[0]),
                                     int(s.split(".")[-1])))
    for i, base in enumerate(conv_entries):
        flat[("params", "vgg", f"conv_{i}", "kernel")] = jnp.asarray(
            np.asarray(sd[base + ".weight"]).transpose(2, 3, 1, 0))
        flat[("params", "vgg", f"conv_{i}", "bias")] = jnp.asarray(
            sd[base + ".bias"])
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        if key in sd:
            flat[("params", f"lin_{i}")] = jnp.asarray(
                np.asarray(sd[key]).reshape(-1))
    return traverse_util.unflatten_dict(flat)
