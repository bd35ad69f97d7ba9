"""Bisect which t-kernel construct trips Mosaic's in_bounds_vreg assert.

Compiles a ladder of minimal Pallas kernels on the chip, each adding one
construct the transposed brick-field kernel uses. Small programs compile
in seconds, so this pinpoints the offender without full-kernel builds.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

print = functools.partial(print, flush=True)
S, TPX, N, VOX, ROWW = 9, 64, 576, 512, 128


def run(name, kern, args, out_shape):
    try:
        got = pl.pallas_call(kern, out_shape=out_shape)(*args)
        np.asarray(got)
        print(f"{name}: OK")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        key = ("Mosaic failed to compile TPU kernel"
               if "Mosaic failed to compile TPU kernel" in msg else None)
        detail = msg.split(key, 1)[1][:180] if key else msg[-180:]
        print(f"{name}: FAIL {detail}")
        return False


def main():
    f32 = jnp.float32
    r8 = jnp.ones((8, TPX), f32)
    o8 = jax.ShapeDtypeStruct((8, TPX), f32)

    # 1: (8, 64) block load + row slices + store
    def k1(x_ref, o_ref):
        x = x_ref[:]
        o_ref[:] = x + x[0:1]
    run("k1 (8,64) load/slice/store", k1, [r8], o8)

    # 2: (1, 64) -> (1, N) lane_tile concat
    def k2(x_ref, o_ref):
        t1 = x_ref[6:7]
        big = jnp.concatenate([t1] * S, axis=1)          # (1, N)
        o_ref[:] = jnp.zeros((8, TPX), f32) + jnp.sum(big)
    run("k2 lane concat (1,64)x9", k2, [r8], o8)

    # 3: (1, N) iota + arith chain
    def k3(x_ref, o_ref):
        s_n = (jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
               // TPX).astype(f32)
        v = s_n * 2.0 + 1.0
        o_ref[:] = jnp.zeros((8, TPX), f32) + jnp.sum(v)
    run("k3 (1,N) iota arith", k3, [r8], o8)

    # 4: 64-aligned lane slices of (1, N)
    def k4(x_ref, o_ref):
        s_n = (jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
               ).astype(f32)
        acc = jnp.zeros((1, TPX), f32)
        for si in range(S):
            acc = acc + s_n[:, si * TPX:(si + 1) * TPX]
        o_ref[:] = jnp.zeros((8, TPX), f32) + acc[0:1]
    run("k4 lane slices @64", k4, [r8], o8)

    # 5: bool chain on (1, N)
    def k5(x_ref, o_ref):
        i = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
        m = (i > 5) & (i < 500)
        v = jnp.where(m, 1.0, 0.0)
        o_ref[:] = jnp.zeros((8, TPX), f32) + jnp.sum(v)
    run("k5 (1,N) bool/where", k5, [r8], o8)

    # 6: i32 compare one-hot (VOX, N) + select bf16
    def k6(x_ref, o_ref):
        rowv = jax.lax.broadcasted_iota(jnp.int32, (VOX, N), 0)
        lid = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1) % VOX
        oh = jnp.where(rowv == lid, jnp.bfloat16(1), jnp.bfloat16(0))
        o_ref[:] = jnp.zeros((8, TPX), f32) + \
            jnp.sum(oh.astype(f32))
    run("k6 (VOX,N) i32 onehot->bf16", k6, [r8], o8)

    # 7: same with an i16 PRECOMPUTED rowv operand
    rowv16 = jax.lax.broadcasted_iota(jnp.int16, (VOX, N), 0)

    def k7(x_ref, rv_ref, o_ref):
        lid = (jax.lax.broadcasted_iota(jnp.int32, (1, N), 1) % VOX
               ).astype(jnp.int16)
        oh = jnp.where(rv_ref[:] == lid, jnp.bfloat16(1), jnp.bfloat16(0))
        o_ref[:] = jnp.zeros((8, TPX), f32) + jnp.sum(oh.astype(f32))
    run("k7 i16 rowv operand onehot", k7, [r8, rowv16], o8)

    # 8: bf16 dot (ROWW, VOX) @ (VOX, N)
    slabT = jnp.ones((ROWW, VOX), jnp.bfloat16)

    def k8(s_ref, o_ref):
        oh = jnp.where(jax.lax.broadcasted_iota(jnp.int32, (VOX, N), 0)
                       == 3, jnp.bfloat16(1), jnp.bfloat16(0))
        r = jnp.dot(s_ref[:], oh, preferred_element_type=f32)
        o_ref[:] = jnp.zeros((8, TPX), f32) + jnp.sum(r)
    run("k8 dot (128,512)@(512,N)", k8, [slabT], o8)

    # 9: (16, 64) block load (sh) + lane tile to (16, N)
    sh = jnp.ones((16, TPX), f32)

    def k9(sh_ref, o_ref):
        shn = jnp.concatenate([sh_ref[:]] * S, axis=1)   # (16, N)
        o_ref[:] = jnp.zeros((8, TPX), f32) + jnp.sum(shn)
    run("k9 (16,64) block + tile", k9, [sh], o8)

    # 10: transposed MLP dots on (., N)
    w1 = jnp.ones((64, 32), jnp.bfloat16)

    def k10(w_ref, o_ref):
        x = jnp.ones((32, N), jnp.bfloat16)
        a = jnp.maximum(jnp.dot(w_ref[:], x,
                                preferred_element_type=f32), 0.0)
        o_ref[:] = jnp.zeros((8, TPX), f32) + jnp.sum(a)
    run("k10 (64,32)@(32,N) dot", k10, [w1], o8)

    # 11: f32 (3,1,8)-style bitw operand slice — (3, ROWW, N) f32
    bitw = jnp.ones((3, ROWW, N), f32)

    def k11(b_ref, o_ref):
        w = b_ref[0] * 2.0 + b_ref[1]
        o_ref[:] = jnp.zeros((8, TPX), f32) + jnp.sum(w)
    run("k11 (3,ROWW,N) operand slice", k11, [bitw], o8)

    # 12: out-ref row read + pl.when accumulate (the composite carry)
    def k12(x_ref, o_ref):
        tau = o_ref[0:1, :]
        live = tau < 4.6

        @pl.when(jnp.any(live))
        def _():
            o_ref[:] = o_ref[:] + jnp.where(live, 1.0, 0.0)
    run("k12 out row read + when", k12, [r8], o8)

    # 13: (1,N) f32 broadcast-multiply against (ROWW, N)
    def k13(x_ref, o_ref):
        f = (jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
             ).astype(f32) * 0.01
        w = jnp.ones((ROWW, N), f32) * ((1.0 - f) + 0.5 * (2.0 * f - 1.0))
        o_ref[:] = jnp.zeros((8, TPX), f32) + jnp.sum(w)
    run("k13 (1,N)->(ROWW,N) bcast", k13, [r8], o8)

    # 14: bool lane_tile concat + vector&scalar bool mix
    def k14(x_ref, o_ref):
        hit = x_ref[0:1] > 0.5                           # (1, 64) bool
        big = jnp.concatenate([hit] * S, axis=1)         # (1, N)
        v = jnp.where(big & (x_ref[1, 0] > 0.0), 1.0, 0.0)
        o_ref[:] = jnp.zeros((8, TPX), f32) + jnp.sum(v)
    run("k14 bool lane tile + scalar mix", k14, [r8], o8)

    # 15: (1,1) splats sliced from a (1,1,8) block
    meta = jnp.arange(8, dtype=f32).reshape(1, 1, 8)

    def k15(m_ref, o_ref):
        m = m_ref[0]                                     # (1, 8)
        acc = jnp.zeros((1, TPX), f32)
        for k in range(3):
            acc = acc + (m[0:1, k:k + 1] - 0.3) * 2.0
        o_ref[:] = jnp.zeros((8, TPX), f32) + acc
    run("k15 (1,1) splats from (1,8)", k15, [meta], o8)

    # 16: exp / sigmoid on (1,N) and (3,N)
    def k16(x_ref, o_ref):
        v = (jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
             ).astype(f32) * 1e-3
        sd = jnp.exp(-v) * (1.0 - jnp.exp(-v))
        sg = jax.nn.sigmoid(jnp.ones((3, N), f32) * v)
        o_ref[:] = jnp.zeros((8, TPX), f32) + jnp.sum(sd) + jnp.sum(sg)
    run("k16 exp/sigmoid (1,N)/(3,N)", k16, [r8], o8)

    # 17: int16 operand simply LOADED and compared upcast
    rv16 = jax.lax.broadcasted_iota(jnp.int16, (VOX, N), 0)

    def k17(rv_ref, o_ref):
        rv = rv_ref[:].astype(jnp.int32)
        oh = jnp.where(rv == 3, 1.0, 0.0)
        o_ref[:] = jnp.zeros((8, TPX), f32) + jnp.sum(oh)
    run("k17 i16 load upcast cmp", k17, [rv16], o8)

    print("BISECT DONE")


if __name__ == "__main__":
    main()
