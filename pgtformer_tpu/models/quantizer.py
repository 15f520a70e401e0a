"""Vector / residual quantization with EMA codebooks.

TPU-native re-design of the reference quantizer stack
(reference archs/tdcrqvae3_arch.py:80-457 — VQEmbedding + RQBottleneck):

  * Codebooks live in a flax variable collection ``"codebook"`` (not params):
    inference reads them; training applies pure state-in/state-out EMA
    updates under ``mutable=["codebook"]``.
  * Distance search is a single batched matmul (`x @ C^T` trick) that maps
    straight onto the MXU; argmin on the VPU.
  * The reference's cross-rank synchronization (`dist.all_reduce` of cluster
    stats, `dist.broadcast` of restart vectors from rank 0 —
    tdcrqvae3_arch.py:157-171) becomes `jax.lax.psum` over the data axis and
    a psum-masked rank-0 selection, both inside the jitted train step.
  * Codebook weights keep the reference layout: [n_embed + 1, dim] with a
    zero "padding" row at index n_embed that is never EMA-updated
    (tdcrqvae3_arch.py:84) — needed for checkpoint-port parity.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any

CODEBOOK_COL = "codebook"


def compute_distances(weight: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Squared L2 distances to every (non-padding) code.

    weight: [n_embed + 1, D]; x: [..., D] -> [..., n_embed].
    (reference tdcrqvae3_arch.py:100-119 `compute_distances`)
    """
    codes = weight[:-1]                       # [n, D]
    x32 = x.astype(jnp.float32)
    c32 = codes.astype(jnp.float32)
    x_sq = jnp.sum(x32 * x32, axis=-1, keepdims=True)          # [..., 1]
    c_sq = jnp.sum(c32 * c32, axis=-1)                          # [n]
    cross = jnp.einsum("...d,nd->...n", x32, c32,
                       preferred_element_type=jnp.float32)
    return x_sq + c_sq - 2.0 * cross


def find_nearest_embedding(weight: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-code index per input vector.

    On TPU this uses the fused Pallas lookup whose distance formulation can
    break near-ties differently from `jnp.argmin` (parity test asserts
    >99.9% agreement) — so code assignments are not bit-reproducible across
    TPU/CPU backends.  Set ``PGT_EXACT_VQ=1`` to force the exact-XLA argmin
    (e.g. when reproducing reference code sequences bit-for-bit).
    """
    from pgtformer_tpu import knobs
    if (jax.default_backend() == "tpu"
            and knobs.get("EXACT_VQ") != "1"):
        # fused VMEM lookup: the [N, n_embed] distance matrix never reaches
        # HBM (ops/pallas_vq.py; falls back to XLA off-TPU / odd geometry)
        from pgtformer_tpu.ops.pallas_vq import nearest_code_pallas
        lead = x.shape[:-1]
        idx = nearest_code_pallas(x.reshape(-1, x.shape[-1]), weight[:-1])
        return idx.reshape(lead)
    return jnp.argmin(compute_distances(weight, x), axis=-1)


def embed(weight: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Codebook lookup (padding index n_embed resolves to the zero row)."""
    return jnp.take(weight, idx, axis=0)


def ema_codebook_update(weight: jnp.ndarray,
                        cluster_size_ema: jnp.ndarray,
                        embed_ema: jnp.ndarray,
                        vectors: jnp.ndarray,
                        idxs: jnp.ndarray,
                        *,
                        decay: float,
                        restart_unused_codes: bool,
                        rng: Optional[jax.Array],
                        axis_name: Optional[str] = None,
                        eps: float = 1e-5) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One EMA step; returns (new_weight, new_cluster_size_ema, new_embed_ema).

    Mirrors reference `_update_buffers` then `_update_embedding`
    (tdcrqvae3_arch.py:137-186): EMA of per-cluster counts/sums (psum'd over
    the data axis), dead-code restart from rank-0 batch vectors, then
    Laplace-smoothed weight re-estimation.
    """
    n_embed, dim = embed_ema.shape
    vecs = vectors.reshape(-1, dim).astype(jnp.float32)
    flat_idx = idxs.reshape(-1)
    n_vectors = vecs.shape[0]

    one_hot = jax.nn.one_hot(flat_idx, n_embed, dtype=jnp.float32)  # [N, n]
    cluster_size = one_hot.sum(axis=0)                               # [n]
    vectors_sum = jnp.einsum("nc,nd->cd", one_hot, vecs,
                             preferred_element_type=jnp.float32)     # [n, D]

    if axis_name is not None:
        cluster_size = jax.lax.psum(cluster_size, axis_name)
        vectors_sum = jax.lax.psum(vectors_sum, axis_name)

    cluster_size_ema = cluster_size_ema * decay + cluster_size * (1 - decay)
    embed_ema = embed_ema * decay + vectors_sum * (1 - decay)

    if restart_unused_codes:
        if rng is None:
            raise ValueError("restart_unused_codes requires an rng key")
        perm_rng, noise_rng = jax.random.split(rng)
        cands = vecs
        if n_vectors < n_embed:
            n_repeats = -(-n_embed // n_vectors)
            std = 0.01 / np.sqrt(dim)
            cands = jnp.tile(cands, (n_repeats, 1))
            cands = cands + jax.random.uniform(noise_rng, cands.shape,
                                               jnp.float32) * std
        perm = jax.random.permutation(perm_rng, cands.shape[0])
        restart_vecs = cands[perm][:n_embed]                         # [n, D]

        if axis_name is not None:
            # reference broadcasts rank 0's vectors (tdcrqvae3_arch.py:170-171);
            # psum-mask selects the rank-0 shard's candidates on every rank.
            is_rank0 = (jax.lax.axis_index(axis_name) == 0).astype(jnp.float32)
            restart_vecs = jax.lax.psum(restart_vecs * is_rank0, axis_name)

        usage = (cluster_size_ema >= 1.0).astype(jnp.float32)        # [n]
        embed_ema = embed_ema * usage[:, None] + restart_vecs * (1 - usage[:, None])
        cluster_size_ema = cluster_size_ema * usage + (1 - usage)

    n = cluster_size_ema.sum()
    normalized = n * (cluster_size_ema + eps) / (n + n_embed * eps)
    new_codes = embed_ema / normalized[:, None]
    weight = weight.at[:-1].set(new_codes.astype(weight.dtype))
    return weight, cluster_size_ema, embed_ema


class RQBottleneck(nn.Module):
    """Residual quantization bottleneck (reference tdcrqvae3_arch.py:206-457).

    Deployed config degenerates to plain VQ: code_shape [32,32,1], shared
    codebook, n_embed 1024, embed_dim 512
    (options/release_test_stage_IIII_dont_need_align_version.yml:62-65).

    Methods:
      __call__(x, train)      -> (quantized+STE, commitment_loss, codes)
      embed_code(codes)       -> latents (sum over depth)
      embed_code_with_depth   -> per-depth embeddings
      embed_partial_code      -> decode with first k codebooks
      get_soft_codes          -> softmax(-dist/T) soft codes
    """
    latent_shape: Tuple[int, int, int]
    code_shape: Tuple[int, int, int]
    n_embed: Any = 1024
    decay: Any = 0.99
    shared_codebook: bool = False
    restart_unused_codes: bool = True
    commitment_loss: str = "cumsum"
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    def setup(self):
        if any(l % c != 0 for l, c in zip(self.latent_shape[:2], self.code_shape[:2])):
            raise ValueError("incompatible code shape or latent shape")
        depth = self.code_shape[-1]
        self.n_embed_list = (tuple(self.n_embed) if isinstance(self.n_embed, (list, tuple))
                             else (self.n_embed,) * depth)
        self.decay_list = (tuple(self.decay) if isinstance(self.decay, (list, tuple))
                           else (self.decay,) * depth)
        rH = self.latent_shape[0] // self.code_shape[0]
        rW = self.latent_shape[1] // self.code_shape[1]
        self.shape_divisor = (rH, rW)
        self.embed_dim = rH * rW * self.latent_shape[2]

        n_books = 1 if self.shared_codebook else depth

        def make(name, i):
            n = self.n_embed_list[i]
            weight = self.variable(CODEBOOK_COL, f"{name}_weight",
                                   self._init_weight, n, self.embed_dim)
            cluster = self.variable(CODEBOOK_COL, f"{name}_cluster_size_ema",
                                    lambda: jnp.zeros((n,), jnp.float32))
            # reference clones the initial weight rows into embed_ema
            # (tdcrqvae3_arch.py:97)
            ema = self.variable(CODEBOOK_COL, f"{name}_embed_ema",
                                lambda: weight.value[:-1].astype(jnp.float32))
            return weight, cluster, ema

        self.books = [make(f"codebooks_{i}", i) for i in range(n_books)]

    def _init_weight(self, n, d):
        rng = self.make_rng("params")
        w = jax.random.normal(rng, (n + 1, d), jnp.float32)
        return w.at[-1].set(0.0)  # padding row (torch padding_idx)

    def _book(self, i: int):
        return self.books[0 if self.shared_codebook else i]

    # -- shape shuffling (reference :273-292) --------------------------------
    def to_code_shape(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, D = x.shape
        rH, rW = self.shape_divisor
        if (rH, rW) == (1, 1):
            return x
        x = x.reshape(B, H // rH, rH, W // rW, rW, D)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(B, H // rH, W // rW, rH * rW * D)

    def to_latent_shape(self, x: jnp.ndarray) -> jnp.ndarray:
        B, h, w, _ = x.shape
        rH, rW = self.shape_divisor
        if (rH, rW) == (1, 1):
            return x
        D = self.latent_shape[2]
        x = x.reshape(B, h, w, rH, rW, D)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(B, h * rH, w * rW, D)

    # -- core ------------------------------------------------------------------
    def quantize(self, x: jnp.ndarray, train: bool):
        """Sequential residual quantization (reference :294-328).

        x: [B, h, w, embed_dim]. Returns (quant_list, codes [B,h,w,d]).
        When training, EMA codebook updates are applied in sequence (the
        shared codebook is updated once per depth, like the reference).
        """
        depth = self.code_shape[-1]
        residual = jax.lax.stop_gradient(x).astype(jnp.float32)
        aggregated = jnp.zeros_like(residual)
        quant_list = []
        code_list = []
        for i in range(depth):
            w_var, cs_var, ema_var = self._book(i)
            idx = find_nearest_embedding(w_var.value, residual)
            quant = embed(w_var.value, idx).astype(jnp.float32)
            if train:
                rng = (self.make_rng("restart")
                       if self.restart_unused_codes else None)
                new_w, new_cs, new_ema = ema_codebook_update(
                    w_var.value, cs_var.value, ema_var.value,
                    residual, idx,
                    decay=self.decay_list[i],
                    restart_unused_codes=self.restart_unused_codes,
                    rng=rng, axis_name=self.axis_name)
                w_var.value = new_w
                cs_var.value = new_cs
                ema_var.value = new_ema
            residual = residual - quant
            aggregated = aggregated + quant
            quant_list.append(aggregated)
            code_list.append(idx[..., None])
        codes = jnp.concatenate(code_list, axis=-1)
        return quant_list, codes

    def __call__(self, x: jnp.ndarray, train: bool = False):
        """x: [B, H, W, D latent]. Returns (quantized w/ STE, commit_loss, codes)."""
        xr = self.to_code_shape(x)
        quant_list, codes = self.quantize(xr, train)
        commitment = self.compute_commitment_loss(xr, quant_list)
        q = self.to_latent_shape(quant_list[-1].astype(x.dtype))
        q = x + jax.lax.stop_gradient(q - x)  # straight-through estimator
        return q, commitment, codes

    def compute_commitment_loss(self, x, quant_list):
        losses = [jnp.mean((x.astype(jnp.float32)
                            - jax.lax.stop_gradient(q)) ** 2)
                  for q in quant_list]
        return jnp.mean(jnp.stack(losses))

    def embed_code(self, codes: jnp.ndarray) -> jnp.ndarray:
        """codes [B, h, w, d] -> latents [B, H, W, D] (reference :354-368)."""
        depth = self.code_shape[-1]
        total = None
        for i in range(depth):
            w_var, _, _ = self._book(i)
            e = embed(w_var.value, codes[..., i])
            total = e if total is None else total + e
        return self.to_latent_shape(total)

    def embed_code_with_depth(self, codes: jnp.ndarray,
                              to_latent: bool = False):
        depth = self.code_shape[-1]
        outs = []
        for i in range(depth):
            w_var, _, _ = self._book(i)
            e = embed(w_var.value, codes[..., i])
            if to_latent:
                e = self.to_latent_shape(e)
            outs.append(e[..., None, :])
        return jnp.concatenate(outs, axis=-2), None

    def embed_partial_code(self, codes: jnp.ndarray, code_idx: int,
                           decode_type: str = "select") -> jnp.ndarray:
        depth = self.code_shape[-1]
        embeds = []
        for i in range(depth):
            w_var, _, _ = self._book(i)
            embeds.append(embed(w_var.value, codes[..., i]))
        if decode_type == "select":
            out = embeds[code_idx]
        elif decode_type == "add":
            out = sum(embeds[:code_idx + 1])
        else:
            raise NotImplementedError(decode_type)
        return self.to_latent_shape(out)

    def get_soft_codes(self, x: jnp.ndarray, temp: float = 1.0,
                       stochastic: bool = False, rng: Optional[jax.Array] = None):
        """Soft (softmax over -dist/T) codes (reference :428-457)."""
        xr = self.to_code_shape(x)
        residual = jax.lax.stop_gradient(xr).astype(jnp.float32)
        soft_list, code_list = [], []
        for i in range(self.code_shape[-1]):
            w_var, _, _ = self._book(i)
            dist = compute_distances(w_var.value, residual)
            soft = jax.nn.softmax(-dist / temp, axis=-1)
            if stochastic:
                if rng is None:
                    rng = self.make_rng("soft_codes")
                rng, sub = jax.random.split(rng)
                flat = soft.reshape(-1, soft.shape[-1])
                code = jax.random.categorical(sub, jnp.log(flat + 1e-20), axis=-1)
                code = code.reshape(soft.shape[:-1])
            else:
                code = jnp.argmin(dist, axis=-1)
            residual = residual - embed(w_var.value, code).astype(jnp.float32)
            code_list.append(code[..., None])
            soft_list.append(soft[..., None, :])
        return (jnp.concatenate(soft_list, axis=-2),
                jnp.concatenate(code_list, axis=-1))
