"""Finer bf16/f32/int32 probes for the difference-recurrence kernel.

Questions (each drives a design decision in the round-4 fill kernel):
  1. Does bf16 multiply legalize?  (arithmetic select: a + m*(b-a))
  2. Does bf16 concat (sublane roll) legalize WITHOUT a select/compare?
  3. Does the arithmetic mask trick legalize: m = max(0, 1 - (x - y))
     for x >= y small ints (equality mask with no compare)?
  4. Real per-step cost of the op mix in int32 vs f32 vs bf16, measured
     with a LONG in-kernel loop (3e5 steps) so device time dwarfs the
     ~30 ms tunnel RPC: t = wall - t(empty-ish), slope across two step
     counts inside one kernel.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def probe(name, build):
    try:
        np.asarray(build())
        print(f"  OK   {name}")
        return True
    except Exception as e:
        print(f"  FAIL {name}: {type(e).__name__} "
              f"{str(e).splitlines()[0][:100]}")
        return False


def run2(fn, dtype, shape=(64, 128), lo=0, hi=60):
    def kernel(x_ref, y_ref, o_ref):
        o_ref[:] = fn(x_ref[:], y_ref[:]).astype(jnp.float32)
    x = jnp.asarray(np.random.randint(lo, hi, shape), dtype)
    y = jnp.asarray(np.random.randint(lo, hi, shape), dtype)
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))(x, y)


def timing(dtype, n_arr, steps, B=128, W=64):
    """One kernel, `steps` iterations of the diff-step op mix on n_arr
    (W,B) arrays. Returns wall seconds (min of 4, sync by np.asarray)."""
    def kernel(x_ref, o_ref):
        one = jnp.full((), 1, dtype)
        arrs0 = tuple(x_ref[:] + jnp.asarray(k % 3, dtype)
                      for k in range(n_arr))

        def body(i, arrs):
            prev = arrs[-1]
            out = []
            for k, a in enumerate(arrs):
                # op mix per array: 1 add + 2 max + 1 sub (gaba's
                # dv/dh/de/df update shape), data-dependent on prev
                a2 = jnp.maximum(a + one, prev)
                a2 = jnp.maximum(a2 - one, arrs[0] - one)
                out.append(a2)
            return tuple(out)

        arrs = jax.lax.fori_loop(0, steps, body, arrs0)
        acc = arrs[0]
        for a in arrs[1:]:
            acc = jnp.maximum(acc, a)
        o_ref[:] = acc.astype(jnp.float32)

    x = jnp.asarray(np.random.randint(0, 3, (W, B)), dtype)
    f = jax.jit(lambda x: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((W, B), jnp.float32))(x))
    np.asarray(f(x))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


if __name__ == "__main__":
    print(f"jax {jax.__version__}, backend {jax.default_backend()}")
    bf = jnp.bfloat16
    print("[bf16 building blocks]")
    probe("bf16 multiply", lambda: run2(lambda a, b: a * b, bf))
    probe("bf16 sub", lambda: run2(lambda a, b: a - b, bf))
    probe("bf16 concat-roll (no select)", lambda: run2(
        lambda a, b: jnp.concatenate(
            [a[1:], jnp.zeros((1, 128), bf)], axis=0) + b, bf))
    probe("bf16 arith-eq-mask max(0,1-(x-y))", lambda: run2(
        lambda a, b: jnp.maximum(1 - (jnp.maximum(a, b) - b),
                                 jnp.zeros((), bf)), bf))
    probe("bf16 arith-select a+m*(b-a)", lambda: run2(
        lambda a, b: a + jnp.maximum(
            1 - (jnp.maximum(a, b) - b), jnp.zeros((), bf)) * (b - a),
        bf))
    probe("bf16 min", lambda: run2(jnp.minimum, bf))
    probe("bf16 broadcast-row mul", lambda: run2(
        lambda a, b: a * b[0:1], bf))
    probe("bf16->int32 astype", lambda: run2(
        lambda a, b: (a + b).astype(jnp.int32).astype(jnp.float32), bf))
    probe("int32->bf16 astype", lambda: run2(
        lambda a, b: (a + b).astype(jnp.bfloat16), jnp.int32))
    # int16 storage with int32 compute: can (W,B) int16 live in the
    # carry (halved registers) if every OP upcasts?
    probe("int16 store/int32 compute roundtrip", lambda: run2(
        lambda a, b: (a.astype(jnp.int32) + b.astype(jnp.int32))
        .astype(jnp.int16).astype(jnp.float32), jnp.int16))

    print("[timing] 6 arrays x (64,128), add+2max+sub per array per "
          "step, in-kernel loop")
    for steps in (200000,):
        for dt, nm in ((jnp.int32, "int32"), (jnp.float32, "float32"),
                       (jnp.bfloat16, "bf16")):
            try:
                t1 = timing(dt, 6, steps)
                t2 = timing(dt, 6, 2 * steps)
                ns = (t2 - t1) / steps * 1e9
                print(f"  {nm}: slope {ns:.2f} ns/step "
                      f"(t1={t1*1e3:.1f}ms t2={t2*1e3:.1f}ms)")
            except Exception as e:
                print(f"  {nm}: FAIL {type(e).__name__} "
                      f"{str(e).splitlines()[0][:90]}")
