"""Probe: low-precision vector-op legalization + relative timing.

Round-4 question: the gaba difference-recurrence kernel needs small-range
(values in [0, 63]) add/max/compare/select/roll at 2 lanes per vreg.
Two candidate encodings:
  (a) native int16/int8 vectors  (blocked in rounds 2-3: Mosaic fails)
  (b) bfloat16 vectors — integers <= 256 are exact in bf16, and bf16 is
      the natively packed TPU dtype; add/max/compare/select are single
      instructions if they legalize.
  (c) SWAR 2x16-in-int32 with mask-and-correct (always legal, more ops)

This probe checks which of (a)/(b) legalize in the current Mosaic build
AND times a step-shaped loop for each encoding vs int32 so we know the
actual per-vreg-op ratio before rewriting the fill kernel.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, build):
    try:
        out = build()
        np.asarray(out)
        print(f"  OK   {name}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"  FAIL {name}: {type(e).__name__} {msg}")
        return False


def elementwise(dtype, fn, shape=(64, 128)):
    def kernel(x_ref, y_ref, o_ref):
        o_ref[:] = fn(x_ref[:], y_ref[:]).astype(jnp.float32)

    x = jnp.asarray(np.random.randint(0, 60, shape), dtype)
    y = jnp.asarray(np.random.randint(0, 60, shape), dtype)
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))(x, y)


def in_carry(dtype, fn, shape=(64, 128)):
    def kernel(x_ref, y_ref, o_ref):
        def body(i, c):
            return fn(c, y_ref[:]).astype(dtype)
        r = jax.lax.fori_loop(0, 8, body, x_ref[:])
        o_ref[:] = r.astype(jnp.float32)

    x = jnp.asarray(np.random.randint(0, 60, shape), dtype)
    y = jnp.asarray(np.random.randint(0, 60, shape), dtype)
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))(x, y)


def roll_concat(dtype, shape=(64, 128)):
    """Sublane roll via concat + select in a carry — the band-step shape."""
    def kernel(x_ref, y_ref, o_ref):
        def body(i, c):
            up = jnp.concatenate(
                [c[1:], jnp.full((1, shape[1]), 0, dtype)], axis=0)
            d = y_ref[0:1] > y_ref[1:2]
            return jnp.where(d, up, c) + jnp.asarray(1, dtype)
        r = jax.lax.fori_loop(0, 8, body, x_ref[:])
        o_ref[:] = r.astype(jnp.float32)

    x = jnp.asarray(np.random.randint(0, 60, shape), dtype)
    y = jnp.asarray(np.random.randint(0, 60, shape), dtype)
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))(x, y)


def step_timer(dtype, W, B, n_steps, n_arr=4):
    """Time a band-step-shaped loop: n_arr (W,B) arrays, per step each
    gets a roll+select+add+max (the fill-kernel op mix), carry-resident.
    Returns ns/step measured via slope between n_steps and 2*n_steps."""
    def make(ns):
        def kernel(x_ref, d_ref, o_ref):
            arrs0 = tuple(x_ref[:] + jnp.asarray(k, dtype)
                          for k in range(n_arr))

            def body(i, arrs):
                d = d_ref[0:1] > (i % 7)
                out = []
                for a in arrs:
                    up = jnp.concatenate(
                        [a[1:], jnp.full((1, B), 0, dtype)], axis=0)
                    a2 = jnp.where(d, up, a)
                    a2 = jnp.maximum(a2 + jnp.asarray(1, dtype),
                                     arrs[0])
                    out.append(a2)
                return tuple(out)
            arrs = jax.lax.fori_loop(0, ns, body, arrs0)
            acc = arrs[0]
            for a in arrs[1:]:
                acc = jnp.maximum(acc, a)
            o_ref[:] = acc.astype(jnp.float32)

        x = jnp.asarray(np.random.randint(0, 4, (W, B)), dtype)
        dd = jnp.asarray(np.random.randint(0, 7, (1, B)), jnp.int32)
        f = jax.jit(lambda x, dd: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((W, B), jnp.float32))(
                x, dd))
        np.asarray(f(x, dd))  # compile+warm
        reps = 5
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(x, dd))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = make(n_steps)
    t2 = make(2 * n_steps)
    return (t2 - t1) / n_steps * 1e9


if __name__ == "__main__":
    print(f"jax {jax.__version__}, backend {jax.default_backend()}")
    for dt, nm in ((jnp.int16, "int16"), (jnp.int8, "int8"),
                   (jnp.bfloat16, "bfloat16"), (jnp.float32, "float32"),
                   (jnp.int32, "int32")):
        print(f"[{nm}]")
        probe(f"{nm} add", lambda: elementwise(dt, lambda a, b: a + b))
        probe(f"{nm} maximum", lambda: elementwise(dt, jnp.maximum))
        probe(f"{nm} compare-gt", lambda: elementwise(
            dt, lambda a, b: (a > b)))
        probe(f"{nm} select", lambda: elementwise(
            dt, lambda a, b: jnp.where(a > b, a, b)))
        probe(f"{nm} max-in-carry", lambda: in_carry(dt, jnp.maximum))
        probe(f"{nm} roll-sel-in-carry", lambda: roll_concat(dt))

    print("[step timing] 4 arrays x (64,128), roll+select+add+max per "
          "step")
    for dt, nm in ((jnp.int32, "int32"), (jnp.float32, "float32"),
                   (jnp.bfloat16, "bfloat16"), (jnp.int16, "int16")):
        try:
            ns = step_timer(dt, 64, 128, 2048)
            print(f"  {nm}: {ns:.1f} ns/step")
        except Exception as e:
            print(f"  {nm}: FAIL {type(e).__name__} "
                  f"{str(e).splitlines()[0][:90]}")
