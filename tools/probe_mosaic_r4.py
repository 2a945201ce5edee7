#!/usr/bin/env python
"""Round-4 Mosaic lowering probes (VERDICT r3 item 1 groundwork).

The MGP transfer-pass diet (fusing the fine-level restrict into the
smooth+res launch and the fine-level y-prolong+add into the post-smooth
launch) rests on two sublane ops lowering on this toolchain:

  1. sublane DEINTERLEAVE: x[1::2, :] (or the reshape equivalent) --
     needed to compact the y-paired residual to half rows in-kernel.
  2. sublane INTERLEAVE: stack([a, b], 1).reshape(2m, n) -- needed to
     expand the half-height coarse correction to fine rows in-kernel.
     (Round 3 recorded this one as the ONLY interleave Mosaic accepts.)

Fallback for (1) if blocked: a (w/2, w) selection matmul on the MXU
(sublane-contracting dot lowers).

Run detached on the TPU:  setsid python -u tools/probe_mosaic_r4.py
"""
import os
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def try_kernel(name, kern, out_shape, *args):
    try:
        out = pl.pallas_call(kern, out_shape=out_shape)(*args)
        val = np.asarray(out)
        print(f"{name}: OK  sample={val.ravel()[:4]}")
        return val
    except Exception as e:  # noqa: BLE001
        print(f"{name}: BLOCKED  {type(e).__name__}: {str(e)[:300]}")
        return None


def main():
    print("backend:", jax.default_backend(), jax.devices())
    x = jnp.arange(16 * 256, dtype=jnp.float32).reshape(16, 256)

    # 1a. sublane deinterleave via basic indexing
    def k_deint_idx(x_ref, o_ref):
        o_ref[:] = x_ref[:][1::2, :]

    got = try_kernel("sublane deinterleave x[1::2]", k_deint_idx,
                     jax.ShapeDtypeStruct((8, 256), jnp.float32), x)
    if got is not None:
        ref = np.asarray(x)[1::2, :]
        print("   correct:", np.array_equal(got, ref))

    # 1b. sublane deinterleave via reshape
    def k_deint_rs(x_ref, o_ref):
        v = x_ref[:].reshape(8, 2, 256)
        o_ref[:] = v[:, 1, :]

    got = try_kernel("sublane deinterleave reshape(8,2,n)[:,1]", k_deint_rs,
                     jax.ShapeDtypeStruct((8, 256), jnp.float32), x)
    if got is not None:
        ref = np.asarray(x)[1::2, :]
        print("   correct:", np.array_equal(got, ref))

    # 1c. fallback: sublane-compact via selection matmul on the MXU
    def k_deint_mm(x_ref, o_ref):
        r = lax.broadcasted_iota(jnp.int32, (8, 16), 0)
        c = lax.broadcasted_iota(jnp.int32, (8, 16), 1)
        sel = (c == 2 * r + 1).astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(
            sel, x_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    from jax import lax  # noqa: E402
    got = try_kernel("sublane compact via MXU selection matmul", k_deint_mm,
                     jax.ShapeDtypeStruct((8, 256), jnp.float32), x)
    if got is not None:
        ref = np.asarray(x)[1::2, :]
        print("   correct:", np.allclose(got, ref))

    # 2. sublane interleave (the round-3 recorded-as-lowerable op)
    a = jnp.ones((8, 256), jnp.float32)
    b = 2.0 * jnp.ones((8, 256), jnp.float32)

    def k_inter(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.stack([a_ref[:], b_ref[:]], axis=1).reshape(16, 256)

    got = try_kernel("sublane interleave stack+reshape", k_inter,
                     jax.ShapeDtypeStruct((16, 256), jnp.float32), a, b)
    if got is not None:
        print("   correct:", np.array_equal(got[0::2], np.asarray(a))
              and np.array_equal(got[1::2], np.asarray(b)))

    # 3. sublane repeat (2x row expansion -- prolong building block)
    def k_rep(a_ref, o_ref):
        o_ref[:] = pltpu.repeat(a_ref[:], 2, 0)

    got = try_kernel("pltpu.repeat axis0", k_rep,
                     jax.ShapeDtypeStruct((16, 256), jnp.float32), a)
    if got is None:
        def k_rep2(a_ref, o_ref):
            o_ref[:] = jnp.repeat(a_ref[:], 2, axis=0)

        got = try_kernel("jnp.repeat axis0", k_rep2,
                         jax.ShapeDtypeStruct((16, 256), jnp.float32), a)

    # 4. re-check: lane deinterleave (recorded blocked in round 3)
    def k_lane(x_ref, o_ref):
        o_ref[:] = x_ref[:][:, 1::2]

    try_kernel("lane deinterleave x[:,1::2] (r3: blocked)", k_lane,
               jax.ShapeDtypeStruct((16, 128), jnp.float32), x)


if __name__ == "__main__":
    from jax import lax  # noqa: F401
    main()
