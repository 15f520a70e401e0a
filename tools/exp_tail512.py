"""Experiment: space-to-depth formulations of the 512px decoder tail.

The decoder profile (tools/profile_decoder.py) shows the per-frame 512px
tail (upsample 128ch 256->512, resblock 128->64, resblock 64, norm_out +
conv_out) running at MFU 0.06-0.15 — low-channel (64) high-res (512^2)
convs waste half the MXU lanes and the GN/SiLU passes run half-empty
vectors.  This experiment evaluates mathematically-identical space-to-
depth (s2d) rewrites that keep the tail at 256^2 x 4C where every op has
full 128-lane tiles:

  base        : current production tail (dilated-subpixel upsample + NHWC
                resblocks at 512^2).
  s2d_phase4  : 4 convs per 3x3 (one per output phase, 2x2 taps, 4Ci->Co).
                FLOPs x16/9, output 64 lanes.
  s2d_pair2   : 2 convs per 3x3 (px folded into channels, 3x2 taps,
                4Ci->2Co).  FLOPs x8/3, output 128 lanes.
  s2d_dense   : 1 conv per 3x3 (both phases folded, 3x3 taps, 4Ci->4Co,
                4/9 kernel density).  FLOPs x4, output 256 lanes.

s2d channel order is channel-major/phase-minor (idx = c*4 + py*2 + px) so
GroupNorm(32) groups stay contiguous: an original group of 2 channels maps
to 8 consecutive s2d channels covering exactly the same element set.

Usage: python tools/exp_tail512.py [--iters 20] [--micro]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

PEAK = 197e12


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def timeit(fn, args, iters, label):
    compiled = jax.jit(fn).lower(*args).compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        fl = float(ca.get("flops", 0.0))
    except Exception:
        fl = 0.0
    out = compiled(*args)
    np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*args)
    np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])
    dt = (time.perf_counter() - t0) / iters
    mfu = fl / dt / PEAK if fl else 0.0
    print(f"{label:46s} {dt * 1e3:8.2f} ms  {fl / 1e9:9.1f} GF  mfu {mfu:5.3f}")
    return dt


def conv(x, k, b=None, pad=1, lhs_dilation=None):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    if isinstance(pad, int):
        pad = ((pad, pad), (pad, pad))
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), pad,
        lhs_dilation=lhs_dilation, dimension_numbers=dn)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def gn(x, scale, bias, groups=32, eps=1e-6):
    N, H, W, C = x.shape
    xf = x.astype(jnp.float32).reshape(N, H, W, groups, C // groups)
    mu = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y.reshape(N, H, W, C) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def s2d(x):
    """[N,2H,2W,C] -> [N,H,W,4C], channel idx c*4 + py*2 + px."""
    N, H2, W2, C = x.shape
    y = x.reshape(N, H2 // 2, 2, W2 // 2, 2, C)
    y = y.transpose(0, 1, 3, 5, 2, 4)           # [N,H,W,C,py,px]
    return y.reshape(N, H2 // 2, W2 // 2, 4 * C)


def d2s(x):
    """inverse of s2d."""
    N, H, W, C4 = x.shape
    C = C4 // 4
    y = x.reshape(N, H, W, C, 2, 2)
    y = y.transpose(0, 1, 4, 2, 5, 3)           # [N,H,py,W,px,C]
    return y.reshape(N, 2 * H, 2 * W, C)


# phase map: for output phase p (0/1 along one axis), original tap dy maps
# to (s2d source offset u, source phase q) with p + dy - 1 = 2u + q.
# M[p][r, q, dy] = 1 where r indexes the kernel row for that u
# (p=0: u in {-1,0} -> r=u+1, pad (1,0); p=1: u in {0,1} -> r=u, pad (0,1)).
_M = np.zeros((2, 2, 2, 3), np.float32)
for _p in range(2):
    for _dy in range(3):
        _off = _p + _dy - 1
        _u, _q = _off >> 1, _off & 1
        _r = _u + 1 if _p == 0 else _u
        _M[_p, _r, _q, _dy] = 1.0
_PAD = {0: (1, 0), 1: (0, 1)}


def k3_to_phase(k3, py, px):
    """k3 [3,3,Ci,Co] -> 2x2 kernel [2,2,4Ci,Co] for output phase (py,px)."""
    ky = jnp.asarray(_M[py])            # [2, 2, 3]  (ry, qy, dy)
    kx = jnp.asarray(_M[px])
    k = jnp.einsum("ryd,sxe,deio->rsiyxo", ky, kx, k3.astype(jnp.float32))
    # [ry, rx, Ci, qy, qx, Co] -> [ry, rx, Ci*4, Co]  (channel-major)
    r, s, ci, _, _, co = k.shape
    return k.reshape(r, s, ci * 4, co)


def k3_to_pair(k3, px):
    """k3 -> [3,2,4Ci,2Co] kernel producing both py phases for column
    phase px (output channel co*2 + py); row pad (1,1), col pad _PAD[px]."""
    k3f = k3.astype(jnp.float32)
    ci, co = k3.shape[2], k3.shape[3]
    ky = np.zeros((2, 3, 2, 3), np.float32)     # [py, ry, qy, dy]
    for p in range(2):
        for dy in range(3):
            off = p + dy - 1
            u, q = off >> 1, off & 1
            ky[p, u + 1, q, dy] = 1.0           # rows embedded in width-3
    kx = jnp.asarray(_M[px])                    # [rx, qx, dx]
    k = jnp.einsum("pryd,sxe,deio->rsiyxop", jnp.asarray(ky), kx, k3f)
    # [ry, rx, Ci, qy, qx, Co, py] -> [3, 2, 4Ci, 2Co]
    return k.reshape(3, 2, ci * 4, co * 2)


def k3_to_dense(k3):
    """k3 -> [3,3,4Ci,4Co] fully folded s2d kernel (4/9 density)."""
    k3f = k3.astype(jnp.float32)
    ci, co = k3.shape[2], k3.shape[3]
    ky = np.zeros((2, 3, 2, 3), np.float32)
    for p in range(2):
        for dy in range(3):
            off = p + dy - 1
            u, q = off >> 1, off & 1
            ky[p, u + 1, q, dy] = 1.0
    kyj = jnp.asarray(ky)
    k = jnp.einsum("pryd,Psxe,deio->rsiyxoPp", kyj, kyj, k3f)
    # [ry,rx,Ci,qy,qx,Co,px?,..] careful: second einsum axis is px (P), first py (p)
    # output channel idx co*4 + py*2 + px -> order (Co, py, px)
    r, s, ci_, _, _, co_, _, _ = k.shape
    k = k.transpose(0, 1, 2, 3, 4, 5, 7, 6)      # [ry,rx,Ci,qy,qx,Co,py,px]
    return k.reshape(r, s, ci_ * 4, co_ * 4)


def k1_to_dense(k1):
    """1x1 kernel [1,1,Ci,Co] -> [1,1,4Ci,4Co] block-diagonal over phases."""
    ci, co = k1.shape[2], k1.shape[3]
    eye = jnp.eye(4, dtype=jnp.float32)
    k = jnp.einsum("pq,io->ipoq", eye, k1[0, 0].astype(jnp.float32))
    return k.reshape(1, 1, ci * 4, co * 4)


def rep4(v):
    """per-channel vector [C] -> s2d [4C] (repeat each entry 4x)."""
    return jnp.repeat(v, 4)


def k44_to_phase(k44, py, px):
    """dilated-subpixel 4x4 kernel -> 2x2 kernel for output phase, taps
    K44[py::2? -> m = 2r + py] (see _subpixel_up_conv_dilated)."""
    return k44[py::2, px::2]


# ---------------------------------------------------------------------------
# parameter set (shapes of the deployed tail)
# ---------------------------------------------------------------------------

def make_params(rng):
    def t(*s):
        return jnp.asarray(rng.normal(scale=0.05, size=s).astype(np.float32))
    return {
        "up": {"k": t(3, 3, 128, 128), "b": t(128)},
        "b0": {"n1s": t(128), "n1b": t(128), "k1": t(3, 3, 128, 64),
               "c1b": t(64), "n2s": t(64), "n2b": t(64),
               "k2": t(3, 3, 64, 64), "c2b": t(64),
               "ks": t(1, 1, 128, 64), "sb": t(64)},
        "b1": {"n1s": t(64), "n1b": t(64), "k1": t(3, 3, 64, 64),
               "c1b": t(64), "n2s": t(64), "n2b": t(64),
               "k2": t(3, 3, 64, 64), "c2b": t(64)},
        "out": {"ns": t(64), "nb": t(64), "k": t(3, 3, 64, 3), "b": t(3)},
    }


_PHASE_A = np.array([[1, 0, 0], [1, 1, 0], [0, 1, 1], [0, 0, 1]], np.float32)


def up_k44(k3):
    A = jnp.asarray(_PHASE_A)
    return jnp.einsum("ur,vc,rcio->uvio", A, A, k3.astype(jnp.float32))


# ---------------------------------------------------------------------------
# tail variants ([8,256,256,128] fuse@256 middle output -> [8,512,512,3])
# ---------------------------------------------------------------------------

def tail_base(p, x):
    k44 = up_k44(p["up"]["k"]).astype(x.dtype)
    h = conv(x, k44, p["up"]["b"], pad=2, lhs_dilation=(2, 2))

    def resblock(q, h, skip_k=None, skip_b=None):
        r = gn(h, q["n1s"], q["n1b"])
        r = jax.nn.silu(r)
        r = conv(r, q["k1"], q["c1b"])
        r = gn(r, q["n2s"], q["n2b"])
        r = jax.nn.silu(r)
        r = conv(r, q["k2"], q["c2b"])
        if skip_k is not None:
            h = conv(h, skip_k, skip_b, pad=0)
        return h + r

    h = resblock(p["b0"], h, p["b0"]["ks"], p["b0"]["sb"])
    h = resblock(p["b1"], h)
    h = gn(h, p["out"]["ns"], p["out"]["nb"])
    h = jax.nn.silu(h)
    return conv(h, p["out"]["k"], p["out"]["b"])


def conv3_s2d(h, k3, b, mode):
    """3x3 conv in s2d domain; h [N,H,W,4Ci] -> [N,H,W,4Co]."""
    Co = k3.shape[3]
    if mode == "phase4":
        ys = []
        for py in (0, 1):
            for px in (0, 1):
                kp = k3_to_phase(k3, py, px).astype(h.dtype)
                ys.append(conv(h, kp, None, pad=(_PAD[py], _PAD[px])))
        y = jnp.stack(ys, axis=-1)               # [...,Co,4] (py*2+px minor)
        y = y.reshape(*y.shape[:-2], Co * 4)
    elif mode == "pair2":
        ys = []
        for px in (0, 1):
            kp = k3_to_pair(k3, px).astype(h.dtype)
            ys.append(conv(h, kp, None, pad=((1, 1), _PAD[px])))
        y = jnp.stack(ys, axis=-1)               # [...,2Co(co*2+py),2(px)]
        y = y.reshape(*y.shape[:-2], Co * 4)     # co*4 + py*2 + px
    else:  # dense
        kd = k3_to_dense(k3).astype(h.dtype)
        y = conv(h, kd, None, pad=1)
    return y + rep4(b).astype(h.dtype)


def make_tail_s2d(mode):
    def tail(p, x):
        # upsample straight into the s2d domain: phase convs of the K44
        k44 = up_k44(p["up"]["k"])
        ys = []
        for py in (0, 1):
            for px in (0, 1):
                kp = k44_to_phase(k44, py, px).astype(x.dtype)
                ys.append(conv(x, kp, None, pad=(_PAD[py], _PAD[px])))
        h = jnp.stack(ys, axis=-1).reshape(*x.shape[:-1], 128 * 4)
        h = h + rep4(p["up"]["b"]).astype(x.dtype)

        def resblock(q, h, skip_k=None, skip_b=None):
            r = gn(h, rep4(q["n1s"]), rep4(q["n1b"]))
            r = jax.nn.silu(r)
            r = conv3_s2d(r, q["k1"], q["c1b"], mode)
            r = gn(r, rep4(q["n2s"]), rep4(q["n2b"]))
            r = jax.nn.silu(r)
            r = conv3_s2d(r, q["k2"], q["c2b"], mode)
            if skip_k is not None:
                h = conv(h, k1_to_dense(skip_k).astype(h.dtype),
                         rep4(skip_b), pad=0)
            return h + r

        h = resblock(p["b0"], h, p["b0"]["ks"], p["b0"]["sb"])
        h = resblock(p["b1"], h)
        h = gn(h, rep4(p["out"]["ns"]), rep4(p["out"]["nb"]))
        h = jax.nn.silu(h)
        h = conv3_s2d(h, p["out"]["k"], p["out"]["b"], mode)
        return d2s(h)
    return tail


# ---------------------------------------------------------------------------


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--micro", action="store_true")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 256, 256, 128)).astype(np.float32))

    if args.micro:
        k = jnp.asarray(rng.normal(scale=0.05, size=(3, 3, 64, 64)),
                        dtype=jnp.float32)
        xb = jnp.asarray(rng.normal(size=(8, 512, 512, 64)), dtype=dt)
        timeit(lambda a: conv(a, k.astype(dt)), (xb,),
               args.iters, "conv3x3 64->64 @512 NHWC")
        k128 = jnp.asarray(rng.normal(scale=0.05, size=(3, 3, 128, 128)),
                           dtype=dt)
        xb128 = jnp.asarray(rng.normal(size=(8, 512, 512, 128)), dtype=dt)
        timeit(lambda a: conv(a, k128), (xb128,),
               args.iters, "conv3x3 128->128 @512 NHWC")
        k256 = jnp.asarray(rng.normal(scale=0.05, size=(3, 3, 256, 256)),
                           dtype=dt)
        xs = jnp.asarray(rng.normal(size=(8, 256, 256, 256)), dtype=dt)
        timeit(lambda a: conv(a, k256), (xs,),
               args.iters, "conv3x3 256->256 @256 NHWC")
        g = jnp.ones((64,), jnp.float32)
        timeit(lambda a: gn(a, g, g), (xb,), args.iters, "GN(32) 64ch @512")
        xs4 = jnp.asarray(rng.normal(size=(8, 256, 256, 256)), dtype=dt)
        timeit(lambda a: gn(a, jnp.ones((256,), jnp.float32),
                            jnp.ones((256,), jnp.float32)), (xs4,),
               args.iters, "GN(32) 256ch @256 (s2d)")
        ko = jnp.asarray(rng.normal(scale=0.05, size=(3, 3, 64, 3)), dtype=dt)
        timeit(lambda a: conv(a, ko), (xb,), args.iters, "conv3x3 64->3 @512")
        return

    params = make_params(rng)

    # parity (fp32, small input)
    xs = jnp.asarray(rng.normal(size=(2, 64, 64, 128)).astype(np.float32))
    ref = jax.jit(tail_base)(params, xs)
    for mode in ("phase4", "pair2", "dense"):
        got = jax.jit(make_tail_s2d(mode))(params, xs)
        d = float(jnp.max(jnp.abs(got - ref)))
        print(f"parity[{mode}] fp32 max|d| = {d:.2e}  "
              f"({'OK' if d < 1e-4 else 'FAIL'})")

    xb = x.astype(dt)
    pb = jax.tree.map(lambda a: jnp.asarray(a), params)
    timeit(tail_base, (pb, xb), args.iters, f"tail base ({args.dtype})")
    for mode in ("phase4", "pair2", "dense"):
        timeit(make_tail_s2d(mode), (pb, xb), args.iters, f"tail s2d_{mode}")


if __name__ == "__main__":
    main()
