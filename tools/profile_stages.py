"""Per-stage device-time breakdown of the serving step (cached-trunk +
middle-only pipeline, the same work bench.py measures).

Each stage is jitted separately and timed with a tiny host readback as the
sync point (block_until_ready is a no-op on the axon tunnel).  Stage sums
slightly over-count vs the fused whole-graph step (extra HBM round trips),
so the whole-graph time is printed for calibration.

Usage:  python tools/profile_stages.py [--batch 8] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def jax_sync(out):
    import jax
    leaf = jax.tree.leaves(out)[0]
    # slice on-device FIRST; np.asarray of the full leaf would read back
    # tens of MB over the tunnel inside the timed region
    np.asarray(leaf.reshape(-1)[:1])


def timeit(fn, args, iters, label, peak_tfs=197.0):
    # AOT: one compile serves execution AND the FLOP count
    compiled = fn.lower(*args).compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        fl = float(ca.get("flops", 0.0))
    except Exception:
        fl = 0.0
    out = compiled(*args)
    jax_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*args)
    jax_sync(out)
    dt = (time.perf_counter() - t0) / iters
    mfu = fl / dt / (peak_tfs * 1e12) if fl else 0.0
    print(f"{label:38s} {dt * 1e3:9.2f} ms   "
          f"{fl / 1e9:8.1f} GF   mfu {mfu:5.3f}")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from pgtformer_tpu.config import RELEASE_PGTFORMER
    from pgtformer_tpu.models.pgtformer import PGTFormer

    cfg = RELEASE_PGTFORMER
    model = PGTFormer(cfg, dtype=jnp.bfloat16, use_pallas=True)
    res = cfg.vqvae.ddconfig.resolution
    T = cfg.vqvae.tf
    B = args.batch

    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, T, res, res, 3), jnp.float32),
                           w=1.0))
    rng = np.random.default_rng(0)
    variables = jax.tree.map(
        lambda s: jnp.asarray(
            rng.normal(scale=0.02, size=s.shape).astype(s.dtype))
        if np.issubdtype(s.dtype, np.floating)
        else jnp.zeros(s.shape, s.dtype), shapes)

    frames = jnp.asarray(rng.uniform(0, 1, (B, res, res, 3)), jnp.float32)

    # ---- stage: per-frame trunk (BiSeNet + encoder trunk), B frames --------
    enc_frames = jax.jit(lambda v, f: model.apply(
        v, f, method="encode_frames"))
    t_trunk = timeit(enc_frames, (variables, frames), args.iters,
                     "encode_frames (parser+trunk, B frames)")
    ff = enc_frames(variables, frames)
    win_idx = jnp.asarray(
        np.stack([np.arange(i, i + T) for i in range(B - T + 1)]))
    pos, trunk, skips = jax.tree.map(lambda a: a[win_idx], ff)
    Bw = pos.shape[0]

    # ---- whole restore_windows ---------------------------------------------
    restore = jax.jit(lambda v, p, t, s: model.apply(
        v, p, t, s, w=1.0, middle_only=True, method="restore_windows")[0])
    t_restore = timeit(restore, (variables, pos, trunk, skips), args.iters,
                       f"restore_windows ({Bw} windows)")

    # ---- encoder head -------------------------------------------------------
    def head_m(mdl, trunk_h):
        z, feats = mdl.encoder(trunk_h, return_multi_res_feats=True,
                               stage="head")
        return mdl.quant_conv(z), feats
    head = jax.jit(lambda v, t: model.apply(v, t, method=head_m))
    t_head = timeit(head, (variables, trunk), args.iters,
                    "encoder head (attn levels + mid)")
    lq_feat, head_feats = head(variables, trunk)

    # ---- transformer --------------------------------------------------------
    th, tw = pos.shape[2:4]

    def tf_m(mdl, lq_feat, pos):
        Bb, Tt = pos.shape[:2]
        query_pos = pos.reshape(Bb, Tt * th * tw, pos.shape[-1])
        tokens = mdl.feat_emb(lq_feat)
        tokens = tokens.reshape(Bb, Tt * th * tw, tokens.shape[-1])
        for layer in mdl.ft_layers:
            tokens = layer(tokens, query_pos=query_pos)
        logits = mdl.idx_pred_head(mdl.idx_pred_norm(tokens))
        return logits.reshape(Bb * Tt, th, tw, mdl.quantizer_depth,
                              mdl.codebook_size)
    tf_fn = jax.jit(lambda v, l, p: model.apply(v, l, p, method=tf_m))
    t_tf = timeit(tf_fn, (variables, lq_feat, pos), args.iters,
                  "transformer (9L + idx head)")
    logits = tf_fn(variables, lq_feat, pos)
    codes = jnp.argmax(logits, axis=-1)

    # ---- decoder + fuse (middle only) ---------------------------------------
    fl = cfg.vqvae.ddconfig.first_attn_level

    def dec_m(mdl, codes, lq_feat, skips, head_feats):
        feats = list(skips) + list(head_feats)
        enc_feat_dict = {f: feats[mdl.fuse_encoder_indices[f]]
                         for f in cfg.connect_list}
        return mdl._decode_restored(codes, lq_feat, enc_feat_dict,
                                    w=1.0, detach_16=True, adain=True,
                                    middle_only=True)
    dec = jax.jit(lambda v, c, l, s, hf: model.apply(
        v, c, l, s, hf, method=dec_m))
    t_dec = timeit(dec, (variables, codes, lq_feat, skips, head_feats),
                   args.iters, "embed+adain+decoder+fuse (middle)")

    total = t_trunk + t_head + t_tf + t_dec
    print(f"{'stage sum':38s} {total * 1e3:9.2f} ms "
          f"(trunk + restore_windows = "
          f"{(t_trunk + t_restore) * 1e3:.2f} ms)")
    print(json.dumps({
        "batch": B, "windows": int(Bw),
        "trunk_ms": round(t_trunk * 1e3, 2),
        "restore_ms": round(t_restore * 1e3, 2),
        "enc_head_ms": round(t_head * 1e3, 2),
        "transformer_ms": round(t_tf * 1e3, 2),
        "decoder_ms": round(t_dec * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
