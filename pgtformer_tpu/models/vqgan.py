"""VQGAN family: VQAutoEncoder, quantizers, PatchGAN discriminator.

Re-implementation of reference archs/vqgan_arch.py (the CodeFormer-lineage
image autoencoder kept as baseline/parent architecture) in channels-last
flax. The encoder/generator are *sequential block lists* — CodeFormer taps
encoder features by block index (reference codeformer_arch.py:278-280), so
we preserve the indexed `blocks.{i}` structure for checkpoint parity.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from pgtformer_tpu.registry import ARCH_REGISTRY

Dtype = Any


def _normalize(dtype, name=None):
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=dtype, name=name)


class VectorQuantizer(nn.Module):
    """Nearest-neighbour VQ with commitment loss + usage/perplexity stats
    (reference vqgan_arch.py:24-98).  I/O channels-last [N, H, W, C]."""
    codebook_size: int
    emb_dim: int
    beta: float = 0.25
    dtype: Dtype = jnp.float32

    def setup(self):
        self.embedding = self.param(
            "embedding",
            lambda rng: jax.random.uniform(
                rng, (self.codebook_size, self.emb_dim), jnp.float32,
                -1.0 / self.codebook_size, 1.0 / self.codebook_size))

    def __call__(self, z: jnp.ndarray):
        embedding = self.embedding
        zf = z.reshape(-1, self.emb_dim).astype(jnp.float32)
        e = embedding.astype(jnp.float32)
        d = ((zf ** 2).sum(1, keepdims=True) + (e ** 2).sum(1)
             - 2.0 * zf @ e.T)
        idx = jnp.argmin(d, axis=1)
        scores = jnp.exp(-jnp.min(d, axis=1) / 10.0)

        z_q = jnp.take(embedding, idx, axis=0).reshape(z.shape).astype(z.dtype)
        loss = (jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2)
                + self.beta * jnp.mean((z_q - jax.lax.stop_gradient(z)) ** 2))
        z_q = z + jax.lax.stop_gradient(z_q - z)

        one_hot = jax.nn.one_hot(idx, self.codebook_size, dtype=jnp.float32)
        e_mean = one_hot.mean(axis=0)
        perplexity = jnp.exp(-jnp.sum(e_mean * jnp.log(e_mean + 1e-10)))
        stats = {"perplexity": perplexity,
                 "min_encoding_indices": idx,
                 "min_encoding_scores": scores,
                 "mean_distance": jnp.mean(d)}
        return z_q, loss, stats

    def get_codebook_feat(self, indices: jnp.ndarray,
                          shape: Optional[Tuple[int, ...]] = None):
        """indices [...] -> embedded features (reference :86-98).
        `shape` is channels-last (N, H, W, C)."""
        z_q = jnp.take(self.embedding, indices.reshape(-1), axis=0)
        if shape is not None:
            z_q = z_q.reshape(shape)
        return z_q


class GumbelQuantizer(nn.Module):
    """Gumbel-softmax quantizer alternative (reference vqgan_arch.py:101-128)."""
    codebook_size: int
    emb_dim: int
    num_hiddens: int
    straight_through: bool = False
    kl_weight: float = 5e-4
    temp_init: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray, train: bool = False):
        hard = self.straight_through if train else True
        logits = nn.Conv(self.codebook_size, (1, 1), dtype=self.dtype,
                         name="proj")(z)
        embed = self.param("embed", nn.initializers.normal(1.0),
                           (self.codebook_size, self.emb_dim), jnp.float32)

        rng = self.make_rng("gumbel")
        gumbel = jax.random.gumbel(rng, logits.shape, jnp.float32)
        y_soft = jax.nn.softmax((logits + gumbel) / self.temp_init, axis=-1)
        if hard:
            idx = jnp.argmax(y_soft, axis=-1)
            y_hard = jax.nn.one_hot(idx, self.codebook_size, dtype=y_soft.dtype)
            y = y_hard + y_soft - jax.lax.stop_gradient(y_soft)
        else:
            y = y_soft
        z_q = jnp.einsum("bhwn,nd->bhwd", y, embed,
                         preferred_element_type=jnp.float32).astype(z.dtype)

        qy = jax.nn.softmax(logits, axis=-1)
        diff = self.kl_weight * jnp.sum(
            qy * jnp.log(qy * self.codebook_size + 1e-10), axis=-1).mean()
        return z_q, diff, {"min_encoding_indices": jnp.argmax(y_soft, -1)}


class ResBlock2D(nn.Module):
    """GN/swish/conv resblock, shortcut named `conv_out`
    (reference vqgan_arch.py:154-177)."""
    out_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch
        h = _normalize(self.dtype, "norm1")(x)
        h = jax.nn.silu(h)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = _normalize(self.dtype, "norm2")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_ch != out_ch:
            x = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="conv_out")(x)
        return x + h


class AttnBlock2D(nn.Module):
    """Single-head full self-attention over H*W tokens
    (reference vqgan_arch.py:180-241)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = _normalize(self.dtype, "norm")(x)
        q = nn.Conv(C, (1, 1), dtype=self.dtype, name="q")(h)
        k = nn.Conv(C, (1, 1), dtype=self.dtype, name="k")(h)
        v = nn.Conv(C, (1, 1), dtype=self.dtype, name="v")(h)
        q = q.reshape(B, H * W, C)
        k = k.reshape(B, H * W, C)
        v = v.reshape(B, H * W, C)
        attn = jnp.einsum("bqc,bkc->bqk", q, k,
                          preferred_element_type=jnp.float32) * (C ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(B, H, W, C).astype(self.dtype)
        out = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class _SeqTower(nn.Module):
    """Indexed sequential block list ('blocks.{i}') shared by encoder and
    generator; `taps` requests intermediate activations by block index."""
    specs: Tuple[Tuple[str, Any], ...]   # (kind, arg) per block
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, taps: Tuple[int, ...] = (), hooks=None):
        """`taps` collects activations after listed block indices; `hooks`
        maps block index -> fn(x)->x applied after that block (CodeFormer's
        fuse-after-block-i pattern, reference codeformer_arch.py:358-363)."""
        tapped = {}
        for i, (kind, arg) in enumerate(self.specs):
            name = f"blocks_{i}"
            if kind == "conv":
                x = nn.Conv(arg, (3, 3), padding=1, dtype=self.dtype,
                            name=name)(x)
            elif kind == "res":
                x = ResBlock2D(out_channels=arg, dtype=self.dtype,
                               name=name)(x)
            elif kind == "attn":
                x = AttnBlock2D(dtype=self.dtype, name=name)(x)
            elif kind == "down":
                x = nn.Conv(arg, (3, 3), strides=(2, 2),
                            padding=((0, 1), (0, 1)), dtype=self.dtype,
                            name=f"{name}_conv")(x)
            elif kind == "up":
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = nn.Conv(arg, (3, 3), padding=1, dtype=self.dtype,
                            name=f"{name}_conv")(x)
            elif kind == "norm":
                x = _normalize(self.dtype, name)(x)
            elif kind == "silu":
                x = jax.nn.silu(x)
            else:
                raise ValueError(kind)
            if i in taps:
                tapped[i] = x
            if hooks and i in hooks:
                x = hooks[i](x)
        return (x, tapped) if taps else x


def encoder_specs(in_channels, nf, emb_dim, ch_mult, num_res_blocks,
                  resolution, attn_resolutions, last_silu=False):
    """Block layout of reference vqgan_arch.Encoder (:243-289)."""
    specs: List[Tuple[str, Any]] = [("conv", nf)]
    curr_res = resolution
    in_ch_mult = (1,) + tuple(ch_mult)
    ch = nf
    for i in range(len(ch_mult)):
        out_ch = nf * ch_mult[i]
        for _ in range(num_res_blocks):
            specs.append(("res", out_ch))
            ch = out_ch
            if curr_res in attn_resolutions:
                specs.append(("attn", None))
        if i != len(ch_mult) - 1:
            specs.append(("down", ch))
            curr_res //= 2
    specs += [("res", ch), ("attn", None), ("res", ch), ("norm", None)]
    if last_silu:
        specs.append(("silu", None))
    specs.append(("conv", emb_dim))
    return tuple(specs)


def generator_specs(nf, emb_dim, ch_mult, res_blocks, img_size,
                    attn_resolutions, last_silu=False, out_channels=3):
    """Block layout of reference vqgan_arch.Generator (:292-341)."""
    ch = nf * ch_mult[-1]
    curr_res = img_size // 2 ** (len(ch_mult) - 1)
    specs: List[Tuple[str, Any]] = [("conv", ch), ("res", ch), ("attn", None),
                                    ("res", ch)]
    for i in reversed(range(len(ch_mult))):
        out_ch = nf * ch_mult[i]
        for _ in range(res_blocks):
            specs.append(("res", out_ch))
            ch = out_ch
            if curr_res in attn_resolutions:
                specs.append(("attn", None))
        if i != 0:
            specs.append(("up", ch))
            curr_res *= 2
    specs.append(("norm", None))
    if last_silu:
        specs.append(("silu", None))
    specs.append(("conv", out_channels))
    return tuple(specs)


@ARCH_REGISTRY.register()
class VQAutoEncoder(nn.Module):
    """Classic VQGAN autoencoder (reference vqgan_arch.py:345-411)."""
    img_size: int = 512
    nf: int = 64
    ch_mult: Tuple[int, ...] = (1, 2, 2, 4, 4, 8)
    quantizer: str = "nearest"
    res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    codebook_size: int = 1024
    emb_dim: int = 256
    beta: float = 0.25
    gumbel_straight_through: bool = False
    gumbel_kl_weight: float = 1e-8
    last_silu: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = _SeqTower(
            encoder_specs(3, self.nf, self.emb_dim, self.ch_mult,
                          self.res_blocks, self.img_size,
                          self.attn_resolutions, self.last_silu),
            dtype=self.dtype)
        if self.quantizer == "nearest":
            self.quantize = VectorQuantizer(self.codebook_size, self.emb_dim,
                                            self.beta, dtype=self.dtype)
        elif self.quantizer == "gumbel":
            self.quantize = GumbelQuantizer(
                self.codebook_size, self.emb_dim, self.emb_dim,
                self.gumbel_straight_through, self.gumbel_kl_weight,
                dtype=self.dtype)
        else:
            raise ValueError(self.quantizer)
        self.generator = _SeqTower(
            generator_specs(self.nf, self.emb_dim, self.ch_mult,
                            self.res_blocks, self.img_size,
                            self.attn_resolutions, self.last_silu),
            dtype=self.dtype)

    def __call__(self, x: jnp.ndarray, code_only: bool = False):
        """x [N, H, W, 3] -> (recon, codebook_loss, stats)."""
        z = self.encoder(x)
        quant, codebook_loss, stats = self.quantize(z)
        if code_only:
            return quant, codebook_loss, stats
        return self.generator(quant), codebook_loss, stats


@ARCH_REGISTRY.register()
class VQGANDiscriminator(nn.Module):
    """PatchGAN discriminator (reference vqgan_arch.py:425-468).

    BatchNorm runs in batch-stats mode during training (train=True);
    variables live in `batch_stats`.  Under data parallelism the batch
    moments sync across the `axis_name` mesh axis (the reference's
    `syncbn: true` converts net_d to SyncBN — options/...stage_III...yml:6);
    without the sync, per-shard statistics make the sharded GAN step
    diverge from the single-device step.
    """
    nc: int = 3
    ndf: int = 64
    n_layers: int = 4
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        i = 0
        x = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=1,
                    dtype=self.dtype, name=f"main_{i}")(x)
        x = nn.leaky_relu(x, 0.2)
        i += 2
        mult = 1
        for n in range(1, self.n_layers):
            mult = min(2 ** n, 8)
            x = nn.Conv(self.ndf * mult, (4, 4), strides=(2, 2), padding=1,
                        use_bias=False, dtype=self.dtype, name=f"main_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                             momentum=0.9, dtype=self.dtype,
                             axis_name=self.axis_name,
                             name=f"main_{i + 1}")(x)
            x = nn.leaky_relu(x, 0.2)
            i += 3
        mult = min(2 ** self.n_layers, 8)
        x = nn.Conv(self.ndf * mult, (4, 4), strides=(1, 1), padding=1,
                    use_bias=False, dtype=self.dtype, name=f"main_{i}")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         momentum=0.9, dtype=self.dtype,
                         axis_name=self.axis_name,
                         name=f"main_{i + 1}")(x)
        x = nn.leaky_relu(x, 0.2)
        i += 3
        return nn.Conv(1, (4, 4), strides=(1, 1), padding=1,
                       dtype=self.dtype, name=f"main_{i}")(x)
