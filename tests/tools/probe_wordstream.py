"""Probe the primitives for the packed-char word-stream design:
  * int32 >> vector-amount, & const (per-lane phase extraction)
  * pltpu.roll on an (8, B) int32 slab inside a fori carry
  * int32 multiply (div-by-10 magic: ((x >> 1) * 52429) >> 18)
All must legalize before rewriting the fill kernel's char path."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, build):
    try:
        r = np.asarray(build())
        print(f"  OK   {name}  (sample {r.ravel()[:4]})")
        return True
    except Exception as e:
        print(f"  FAIL {name}: {type(e).__name__} "
              f"{str(e).splitlines()[0][:100]}")
        return False


def var_shift():
    def kernel(w_ref, s_ref, o_ref):
        o_ref[:] = (w_ref[:] >> (3 * s_ref[:])) & 7
    w = jnp.asarray(np.random.randint(0, 2**30, (8, 128)), jnp.int32)
    s = jnp.asarray(np.random.randint(0, 10, (8, 128)), jnp.int32)
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))(w, s)


def roll_in_carry():
    def kernel(w_ref, o_ref):
        def body(i, c):
            slab, sh = c
            rot = pltpu.roll(slab, -1, axis=0)
            wrap = sh >= 30
            slab = jnp.where(wrap, rot, slab)
            sh = jnp.where(wrap, 0, sh + 3)
            return (slab, sh)
        slab, sh = jax.lax.fori_loop(
            0, 64, body, (w_ref[:], jnp.zeros((1, 128), jnp.int32)))
        o_ref[:] = slab + sh
    w = jnp.asarray(np.random.randint(0, 100, (8, 128)), jnp.int32)
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))(w)


def div10_magic():
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        o_ref[:] = ((x >> 1) * 52429) >> 18
    x = jnp.asarray(np.random.randint(0, 2**18, (8, 128)), jnp.int32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))(x)
    ref = np.asarray(x) // 10
    got = np.asarray(out)
    assert (got == ref).all(), (got[got != ref][:4], ref[got != ref][:4])
    return out


def stream_timing(steps):
    """Per-step cost of the full both-sides stream update."""
    def kernel(wa_ref, wb_ref, d_ref, o_ref):
        def body(i, c):
            sa, sha, sb, shb, acc = c
            cura = (sa[0:1] >> sha) & 7
            curb = (sb[0:1] >> shb) & 7
            down = d_ref[0:1] > (i % 7)
            di = down.astype(jnp.int32)
            sha = sha + 3 * (1 - di)
            shb = shb + 3 * di
            wa = sha >= 30
            wb = shb >= 30
            sa = jnp.where(wa, pltpu.roll(sa, -1, axis=0), sa)
            sb = jnp.where(wb, pltpu.roll(sb, -1, axis=0), sb)
            sha = jnp.where(wa, 0, sha)
            shb = jnp.where(wb, 0, shb)
            return (sa, sha, sb, shb, acc + cura + curb)
        z = jnp.zeros((1, 128), jnp.int32)
        sa, sha, sb, shb, acc = jax.lax.fori_loop(
            0, steps, body, (wa_ref[:], z, wb_ref[:], z, z))
        o_ref[:] = acc + sa[0:1] + sb[0:1]
    wa = jnp.asarray(np.random.randint(0, 2**30, (8, 128)), jnp.int32)
    wb = jnp.asarray(np.random.randint(0, 2**30, (8, 128)), jnp.int32)
    d = jnp.asarray(np.random.randint(0, 7, (1, 128)), jnp.int32)
    f = jax.jit(lambda a, b, c: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32))(
            a, b, c))
    np.asarray(f(wa, wb, d))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(f(wa, wb, d))
        best = min(best, time.perf_counter() - t0)
    return best


if __name__ == "__main__":
    print(f"jax {jax.__version__}, backend {jax.default_backend()}")
    probe("var-amount shift+mask", var_shift)
    probe("pltpu.roll int32 slab in carry", roll_in_carry)
    probe("div-by-10 magic (verified)", div10_magic)
    try:
        t1 = stream_timing(200000)
        t2 = stream_timing(400000)
        print(f"  stream update: {(t2-t1)/200000*1e9:.2f} ns/step "
              f"(t1={t1*1e3:.1f}ms)")
    except Exception as e:
        print(f"  stream timing FAIL: {type(e).__name__} "
              f"{str(e).splitlines()[0][:100]}")
