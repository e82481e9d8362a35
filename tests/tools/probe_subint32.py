"""Probe: which sub-int32 vector ops legalize in this Mosaic build.

Round-2 found all sub-int32 vector compares fail. Re-run each round:
the moment int16/int8 compares legalize, the gaba difference-recurrence
register-resident kernel design unlocks (PERF_NOTES.md)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, dtype, fn):
    def kernel(x_ref, y_ref, o_ref):
        o_ref[:] = fn(x_ref[:], y_ref[:]).astype(jnp.int32)

    x = jnp.asarray(np.random.randint(-100, 100, (64, 128)), dtype)
    y = jnp.asarray(np.random.randint(-100, 100, (64, 128)), dtype)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
        )(x, y)
        np.asarray(out)
        print(f"  OK   {name}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:100]
        print(f"  FAIL {name}: {type(e).__name__} {msg}")
        return False


def probe_carry(name, dtype, fn):
    """Same op but inside a fori_loop carry (the production shape)."""
    def kernel(x_ref, y_ref, o_ref):
        def body(i, c):
            return fn(c, y_ref[:]).astype(dtype)
        r = jax.lax.fori_loop(0, 8, body, x_ref[:])
        o_ref[:] = r.astype(jnp.int32)

    x = jnp.asarray(np.random.randint(-100, 100, (64, 128)), dtype)
    y = jnp.asarray(np.random.randint(-100, 100, (64, 128)), dtype)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
        )(x, y)
        np.asarray(out)
        print(f"  OK   carry {name}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:100]
        print(f"  FAIL carry {name}: {type(e).__name__} {msg}")
        return False


if __name__ == "__main__":
    print(f"jax {jax.__version__}, backend {jax.default_backend()}")
    for dt in (jnp.int16, jnp.int8, jnp.uint8):
        n = dt.__name__ if hasattr(dt, "__name__") else str(dt)
        n = str(np.dtype(dt))
        print(f"[{n}]")
        probe(f"{n} add", dt, lambda a, b: a + b)
        probe(f"{n} maximum", dt, jnp.maximum)
        probe(f"{n} compare-gt", dt, lambda a, b: a > b)
        probe(f"{n} select", dt,
              lambda a, b: jnp.where(a > b, a, b))
        probe_carry(f"{n} max-in-carry", dt, jnp.maximum)
        probe_carry(f"{n} sel-in-carry", dt,
                    lambda a, b: jnp.where(a > b, a, b))
