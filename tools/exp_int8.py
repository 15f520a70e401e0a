"""Probe: does XLA:TPU map int8 dots/convs to the MXU's 2x int8 path?

v5e peak: ~197 TFLOP/s bf16, ~394 TOP/s int8.  If an int8 conv runs ~2x a
bf16 conv of the same shape, an opt-in int8 serving path can break the
bf16 roofline ceiling documented in BASELINE.md.  Run on the real chip.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20):
    """fori_loop-amortized on-device timing (exp_elementwise.py pattern):
    the loop body folds a scalar of the output back into the first operand
    so XLA cannot hoist it; dispatch is paid once per measurement."""

    def looped(*a):
        def body(_, carry):
            out = fn(carry, *a[1:])
            if out.shape == carry.shape:
                # full data dependency: XLA cannot slice through the op
                return out.astype(carry.dtype)
            return carry + out.reshape(-1)[0].astype(carry.dtype)
        return jax.lax.fori_loop(0, n, body, a[0])

    compiled = jax.jit(looped).lower(*args).compile()
    out = compiled(*args)
    np.asarray(out.reshape(-1)[:1])
    t0 = time.perf_counter()
    out = compiled(*args)
    np.asarray(out.reshape(-1)[:1])
    return (time.perf_counter() - t0) / n


def main():
    dev = jax.devices()[0]
    print("device:", dev)
    key = jax.random.PRNGKey(0)

    # --- big matmul: 8192^3 ---
    M = N = K = 8192
    a_f = jax.device_put(jax.random.normal(key, (M, K), jnp.bfloat16), dev)
    b_f = jax.device_put(jax.random.normal(key, (K, N), jnp.bfloat16), dev)
    a_i = jax.device_put((np.random.randint(-127, 127, (M, K))).astype(np.int8), dev)
    b_i = jax.device_put((np.random.randint(-127, 127, (K, N))).astype(np.int8), dev)

    dot_bf = jax.jit(lambda x, y: jnp.dot(x, y))
    dot_i8 = jax.jit(lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))

    t_bf = timeit(dot_bf, a_f, b_f)
    t_i8 = timeit(dot_i8, a_i, b_i)
    fl = 2 * M * N * K
    print(f"matmul 8192^3  bf16: {t_bf*1e3:7.2f} ms  {fl/t_bf/1e12:6.1f} TF/s")
    print(f"matmul 8192^3  int8: {t_i8*1e3:7.2f} ms  {fl/t_i8/1e12:6.1f} TOP/s  speedup {t_bf/t_i8:.2f}x")

    # --- decoder-geometry conv: 3x3, 256ch at 128px and 128ch at 256px (B=6 windows x T=3 merged -> 18) ---
    for (Bc, H, Cin, Cout) in [(18, 128, 256, 256), (18, 256, 128, 128), (18, 512, 64, 64)]:
        x_f = jax.device_put(jax.random.normal(key, (Bc, H, H, Cin), jnp.bfloat16), dev)
        w_f = jax.device_put(jax.random.normal(key, (3, 3, Cin, Cout), jnp.bfloat16), dev)
        x_i = jax.device_put(np.random.randint(-127, 127, (Bc, H, H, Cin)).astype(np.int8), dev)
        w_i = jax.device_put(np.random.randint(-127, 127, (3, 3, Cin, Cout)).astype(np.int8), dev)

        dn = jax.lax.conv_dimension_numbers(x_f.shape, w_f.shape, ("NHWC", "HWIO", "NHWC"))
        conv_bf = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn))
        conv_i8 = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32))

        t_bf = timeit(conv_bf, x_f, w_f, n=10)
        fl = 2 * Bc * H * H * Cin * Cout * 9
        try:
            t_i8 = timeit(conv_i8, x_i, w_i, n=10)
            print(f"conv3x3 {Bc}x{H}^2 {Cin}->{Cout}  bf16: {t_bf*1e3:6.2f} ms {fl/t_bf/1e12:6.1f} TF/s"
                  f"   int8: {t_i8*1e3:6.2f} ms {fl/t_i8/1e12:6.1f} TOP/s  speedup {t_bf/t_i8:.2f}x")
        except Exception as e:  # noqa: BLE001
            print(f"conv3x3 {Bc}x{H}^2 {Cin}->{Cout}  bf16: {t_bf*1e3:6.2f} ms  int8 FAILED: {type(e).__name__}: {e}"[:300])

    # --- mixed int8 x int8 -> f32 dequant epilogue fusion check (scale per-channel) ---
    x_i = jax.device_put(np.random.randint(-127, 127, (18, 128, 128, 256)).astype(np.int8), dev)
    w_i = jax.device_put(np.random.randint(-127, 127, (3, 3, 256, 256)).astype(np.int8), dev)
    sx = jax.device_put(jnp.float32(0.01), dev)
    sw = jax.device_put(jnp.ones((256,), jnp.float32) * 0.02, dev)
    dn = jax.lax.conv_dimension_numbers(x_i.shape, w_i.shape, ("NHWC", "HWIO", "NHWC"))

    def conv_i8_deq(x, w, sx, sw):
        acc = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * (sx * sw)).astype(jnp.bfloat16)

    try:
        t = timeit(jax.jit(conv_i8_deq), x_i, w_i, sx, sw, n=10)
        fl = 2 * 18 * 128 * 128 * 256 * 256 * 9
        print(f"conv3x3+dequant int8->bf16: {t*1e3:6.2f} ms {fl/t/1e12:6.1f} TOP/s")
    except Exception as e:  # noqa: BLE001
        print(f"conv3x3+dequant FAILED: {type(e).__name__}: {e}"[:300])


if __name__ == "__main__":
    main()
