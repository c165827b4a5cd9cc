"""Probe: does int8 compute pay on this v5e toolchain?

v5e peak is ~394 TOPS int8 vs ~197 TFLOP/s bf16. This measures, with
the fused fori_loop methodology (BENCH_NOTES "Timing rules"):
  1. a big matmul: bf16xbf16->f32 vs s8xs8->s32
  2. flagship-shaped convs (quadrant 14x14x256->128 and layer1-class
     56x56x64->64, 3x3): bf16 vs s8
to decide whether a quantized inference path is worth building.

Hoisting guard: the loop body's input is perturbed by isnan(acc) — a
dynamic value XLA cannot constant-fold (it IS always 0 at runtime), so
the compute cannot be hoisted out of the timing loop.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

STEPS = 30


def perturb(x, acc):
    """x + (dynamic runtime-zero), unfoldable by XLA."""
    return x + jnp.isnan(acc).astype(x.dtype)


def fused_loop(step, x):
    def run(x):
        def body(i, acc):
            return step(x, acc)
        return lax.fori_loop(0, STEPS, body, jnp.zeros((), jnp.float32))
    c = jax.jit(run)
    jax.device_get(c(x))
    t0 = time.perf_counter()
    jax.device_get(c(x))
    return time.perf_counter() - t0


def report(name, flops, t):
    print(f"{name}: {t*1e3:7.1f} ms  ({flops/t/1e12:6.1f} T/s)",
          flush=True)


def main():
    rng = np.random.default_rng(0)

    # --- matmul probe: (4096, 4096) @ (4096, 4096)
    a8 = rng.integers(-127, 127, (4096, 4096)).astype(np.int8)
    b8 = rng.integers(-127, 127, (4096, 4096)).astype(np.int8)
    bbf = jnp.asarray(b8, jnp.bfloat16)
    b8j = jnp.asarray(b8)
    mmflops = 2 * 4096**3 * STEPS

    def mm_bf16(x, acc):
        y = jnp.dot(perturb(x, acc), bbf,
                    preferred_element_type=jnp.float32)
        return acc + y[0, 0]

    def mm_s8(x, acc):
        y = jnp.dot(perturb(x, acc), b8j,
                    preferred_element_type=jnp.int32)
        return acc + y[0, 0].astype(jnp.float32)

    report("matmul4096 bf16", mmflops,
           fused_loop(mm_bf16, jnp.asarray(a8, jnp.bfloat16)))
    try:
        report("matmul4096 int8", mmflops, fused_loop(mm_s8,
                                                      jnp.asarray(a8)))
    except Exception as e:
        print(f"matmul int8 FAILED: {type(e).__name__}: {str(e)[:300]}")

    # --- conv probes
    def conv_probe(name, B, H, Cin, Cout):
        x8 = rng.integers(-127, 127, (B, H, H, Cin)).astype(np.int8)
        k8 = rng.integers(-127, 127, (3, 3, Cin, Cout)).astype(np.int8)
        dn = lax.conv_dimension_numbers(x8.shape, k8.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        kbf = jnp.asarray(k8, jnp.bfloat16)
        k8j = jnp.asarray(k8)
        cflops = 2 * B * H * H * Cin * Cout * 9 * STEPS

        def c_bf16(x, acc):
            y = lax.conv_general_dilated(
                perturb(x, acc), kbf, (1, 1), "SAME",
                dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            return acc + y[0, 0, 0, 0]

        def c_s8(x, acc):
            y = lax.conv_general_dilated(
                perturb(x, acc), k8j, (1, 1), "SAME",
                dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return acc + y[0, 0, 0, 0].astype(jnp.float32)

        report(f"{name} bf16", cflops,
               fused_loop(c_bf16, jnp.asarray(x8, jnp.bfloat16)))
        try:
            report(f"{name} int8", cflops,
                   fused_loop(c_s8, jnp.asarray(x8)))
        except Exception as e:
            print(f"{name} int8 FAILED: "
                  f"{type(e).__name__}: {str(e)[:300]}")

    conv_probe("conv14x256->128", 256, 14, 256, 128)
    conv_probe("conv56x64->64", 256, 56, 64, 64)


if __name__ == "__main__":
    main()
