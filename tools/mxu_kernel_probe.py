"""Fast Mosaic compile+numerics probe for the brick-field kernels.

CPU interpret mode can't catch Mosaic lowering rejections (f32 iota,
cumsum, cross-tiling reshapes — all found the slow way on chip); this
probe compiles BOTH kernel layouts on the real TPU at toy shapes in ~1
minute and checks them against the numpy golden, so kernel iteration
doesn't pay the fps harness's bake/setup. Usage: python
tools/mxu_kernel_probe.py [n|t|both]
"""
import functools
import sys
import time

import jax.numpy as jnp
import numpy as np

print = functools.partial(print, flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    sys.path.insert(0, "/root/repo")
    from google_nerf_tpu.ops.pallas.brick_field import (
        brick_field_tiles, brick_field_tiles_reference, brick_field_tiles_t)
    from tests.test_render_brick_mxu import _toy_inputs

    args, kw = _toy_inputs()
    nslots = kw.pop("nslots")
    a = [jnp.asarray(x) for x in args]
    kw["nslots"] = jnp.asarray(nslots)
    want = brick_field_tiles_reference(*args, nslots=nslots,
                                       **{k: v for k, v in kw.items()
                                          if k != "nslots"})

    def check(name, fn, *fa, want=want, **fkw):
        t0 = time.time()
        try:
            got = np.asarray(fn(*fa, **fkw))
        except Exception as e:  # noqa: BLE001 — probe reports, not raises
            msg = str(e)
            if "Mosaic failed to compile TPU kernel" in msg:
                detail = msg.split("Mosaic failed to compile TPU kernel",
                                   1)[1][:700]
            else:
                detail = msg[-500:]
            print(f"{name}: FAIL ({time.time()-t0:.0f}s) "
                  f"{type(e).__name__}: {detail}")
            return False
        ok = (np.all(np.isfinite(got))
              and np.allclose(got[:, 0], want[:, 0], atol=5e-2, rtol=5e-2)
              and np.allclose(got[:, 1:5], want[:, 1:5], atol=3e-2)
              and np.array_equal(got[:, 5], want[:, 5]))
        print(f"{name}: {'OK' if ok else 'NUMERIC MISMATCH'} "
              f"({time.time()-t0:.0f}s) "
              f"pairs={got[:, 5].sum():.0f}/{want[:, 5].sum():.0f}")
        return ok

    tid = jnp.asarray([1, 0], jnp.int32)    # permuted full-capacity bands
    band_kw = dict(kw)
    band_kw["nslots"] = jnp.minimum(kw["nslots"][tid], 3)
    if which in ("n", "both"):
        check("n-kernel", brick_field_tiles, *a, **kw)
        check("n-kernel banded", brick_field_tiles, *a, tid=tid,
              Lcall=3, **band_kw)
    if which in ("t", "both"):
        aT = list(a)
        aT[4] = jnp.swapaxes(a[4], 1, 2)
        check("t-kernel", brick_field_tiles_t, *aT, **kw)
        check("t-kernel banded", brick_field_tiles_t, *aT, tid=tid,
              Lcall=3, **band_kw)
    if which in ("tp", "both"):
        from google_nerf_tpu.ops.pallas.brick_field import \
            brick_field_tiles_tp
        args4, kw4 = _toy_inputs(Lp=4)
        nslots4 = kw4.pop("nslots")
        a4 = [jnp.asarray(x) for x in args4]
        a4[4] = jnp.swapaxes(a4[4], 1, 2)
        kw4["nslots"] = jnp.asarray(nslots4)
        want4 = brick_field_tiles_reference(
            *args4, nslots=nslots4,
            **{k: v for k, v in kw4.items() if k != "nslots"})
        check("tp-kernel P=2", brick_field_tiles_tp, *a4, P=2,
              want=want4, **kw4)
    print("PROBE DONE")


if __name__ == "__main__":
    main()
