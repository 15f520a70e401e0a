"""Per-stage device-time breakdown of the flagship PGTFormer forward.

Each stage is jitted separately and timed with a tiny host readback as the
sync point (block_until_ready is a no-op on the axon tunnel).  Stage sums
slightly over-count vs the fused whole-graph step (extra HBM round trips),
so the whole-graph time is printed for calibration.

Usage:  python tools/profile_stages.py [--batch 8] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def timeit(fn, args, iters, label):
    out = fn(*args)
    jax_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax_sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:34s} {dt * 1e3:9.2f} ms")
    return dt


def jax_sync(out):
    import jax
    leaf = jax.tree.leaves(out)[0]
    # slice on-device FIRST; np.asarray of the full leaf would read back
    # tens of MB over the tunnel inside the timed region
    np.asarray(leaf.reshape(-1)[:1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from pgtformer_tpu.config import RELEASE_PGTFORMER
    from pgtformer_tpu.models.pgtformer import PGTFormer
    from pgtformer_tpu.ops.image import imagenet_normalize

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

    x = jnp.asarray(rng.uniform(0, 1, (B, T, res, res, 3)), jnp.float32)

    # ---- whole graph -------------------------------------------------------
    @jax.jit
    def whole(v, x):
        out, _, _ = model.apply(v, x, w=1.0)
        return out

    t_whole = timeit(whole, (variables, x), args.iters, "whole forward")

    # ---- stage: parser (BiSeNet + convpos) ---------------------------------
    @jax.jit
    def parser_fn(v, x):
        def m(mdl, x):
            B, T, H, W, _ = x.shape
            nx = imagenet_normalize(x).reshape(B * T, H, W, 3)
            cond = mdl.conditionnet(nx)
            return mdl.convpos(cond)
        return model.apply(v, x, method=m)

    t_parser = timeit(parser_fn, (variables, x), args.iters,
                      "parser (BiSeNet+convpos) 3B frames")

    # ---- stage: encoder ----------------------------------------------------
    @jax.jit
    def encoder_fn(v, x):
        def m(mdl, x):
            z, feats = mdl.encoder(x, return_multi_res_feats=True)
            return mdl.quant_conv(z), feats
        return model.apply(v, x, method=m)

    t_enc = timeit(encoder_fn, (variables, x), args.iters,
                   "encoder (+feats, quant_conv)")
    lq_feat, feats = encoder_fn(variables, x)

    # ---- stage: transformer (9 layers + idx head) --------------------------
    cond = parser_fn(variables, x)
    th, tw = cond.shape[1:3]

    @jax.jit
    def transformer_fn(v, lq_feat, cond):
        def m(mdl, lq_feat, cond):
            BT = lq_feat.shape[0]
            Bb = BT // T
            query_pos = cond.reshape(Bb, T * th * tw, cond.shape[-1])
            tokens = mdl.feat_emb(lq_feat)
            cc = tokens.shape[-1]
            tokens = tokens.reshape(Bb, T * th * tw, cc)
            for layer in mdl.ft_layers:
                tokens = layer(tokens, query_pos=query_pos)
            logits = mdl.idx_pred_head(mdl.idx_pred_norm(tokens))
            return logits.reshape(BT, th, tw, mdl.quantizer_depth,
                                  mdl.codebook_size)
        return model.apply(v, lq_feat, cond, method=m)

    t_tf = timeit(transformer_fn, (variables, lq_feat, cond), args.iters,
                  "transformer (9L + idx head)")
    logits = transformer_fn(variables, lq_feat, cond)

    # ---- stage: embed + decoder + fuse -------------------------------------
    codes = jnp.argmax(logits, axis=-1)

    @jax.jit
    def decoder_fn(v, codes, lq_feat, f1, f2, f3, f4):
        def m(mdl, codes, lq_feat, f1, f2, f3, f4):
            enc_feat_dict = {"256": f1, "128": f2, "64": f3, "32": f4}
            return mdl._decode_restored(codes, lq_feat, enc_feat_dict,
                                        w=1.0, detach_16=True, adain=True)
        return model.apply(v, codes, lq_feat, f1, f2, f3, f4, method=m)

    t_dec = timeit(decoder_fn,
                   (variables, codes, lq_feat,
                    feats[1], feats[2], feats[3], feats[4]),
                   args.iters, "embed+adain+decoder+fuse")

    total = t_parser + t_enc + t_tf + t_dec
    print(f"{'stage sum':34s} {total * 1e3:9.2f} ms "
          f"(whole {t_whole * 1e3:.2f} ms)")
    print(json.dumps({
        "batch": B,
        "whole_ms": round(t_whole * 1e3, 2),
        "parser_ms": round(t_parser * 1e3, 2),
        "encoder_ms": round(t_enc * 1e3, 2),
        "transformer_ms": round(t_tf * 1e3, 2),
        "decoder_ms": round(t_dec * 1e3, 2),
        "fps_whole": round(B / t_whole, 2),
    }))


if __name__ == "__main__":
    main()
