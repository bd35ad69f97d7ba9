"""Micro-probe: where do the non-encoder ~13 ms of the field f+b go?

Measures, on the flagship shapes (131k packed samples):
  raw gather floor          jnp.take of 1.05M rows from the packed table
  packed encode fwd         full packed_hash_encode (gather + trilerp)
  sigma MLP f+b             (131k, 32) -> 64 -> 16
  rgb MLP f+b               (131k, 41) -> 64 -> 64 -> 3
  sh4 + norm + sigmoid f+b  the glue around the MLPs
  full ngp_apply f+b        everything
and dtype variants (f32 vs bf16 compute).
"""
import functools
import time

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)
key = jax.random.PRNGKey(0)


def chain_time(step_fn, carry0, n=10):
    c = step_fn(carry0)
    _ = float(jax.tree.leaves(c)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        c = step_fn(c)
    _ = float(jax.tree.leaves(c)[0].ravel()[0])
    return (time.perf_counter() - t0) / n


def t(name, fn, carry0, n=10):
    dt = chain_time(jax.jit(fn), carry0, n=n)
    print(f"{name:28s} {dt*1e3:7.2f} ms")
    return dt


def main():
    from google_nerf_tpu.models.mlp import init_mlp, mlp_apply
    from google_nerf_tpu.models.ngp import (NGPConfig, init_ngp, ngp_apply,
                                            sh_encode_deg4)
    from google_nerf_tpu.ops.packed_hash import packed_hash_encode

    B = 131072
    cfg = NGPConfig(scale=0.5, encoder="packed", grid_size=128,
                    compute_dtype=jnp.bfloat16)
    params = init_ngp(key, cfg)
    pcfg = cfg.packed_cfg
    table = params["packed_table"]
    print(f"table {table.shape} {table.dtype}, levels={pcfg.n_levels}, "
          f"out_dim={pcfg.out_dim}, row_width={pcfg.row_width}")
    x01 = jax.random.uniform(key, (B, 3))
    d = jax.random.normal(key, (B, 3))
    g32 = jax.random.normal(key, (B, pcfg.out_dim))

    # raw gather floor: n_levels fat rows per sample
    n_rows = B * pcfg.n_levels
    tab2d = table.reshape(table.shape[0] * table.shape[1], -1) \
        if table.ndim == 3 else table
    idx = jax.random.randint(key, (n_rows,), 0, tab2d.shape[0])
    print(f"gather rows: {n_rows/1e6:.2f}M from {tab2d.shape} "
          f"({tab2d.shape[-1] * 4}B rows)")

    def raw_gather(c):
        rows = jnp.take(tab2d, (idx + c[0]) % tab2d.shape[0], axis=0)
        return (c[0] * 0, rows.sum(0))

    t("raw gather floor", raw_gather, (jnp.int32(0), jnp.zeros(tab2d.shape[-1])))

    def raw_gather_bf16(c):
        rows = jnp.take(tab2d.astype(jnp.bfloat16),
                        (idx + c[0]) % tab2d.shape[0], axis=0)
        return (c[0] * 0, rows.sum(0))

    t("raw gather floor bf16", raw_gather_bf16,
      (jnp.int32(0), jnp.zeros(tab2d.shape[-1], jnp.bfloat16)))

    def enc_fwd(c):
        out = packed_hash_encode(table + c[0] * 0, x01, pcfg)
        return (c[0] * 0, out[0])

    t("packed encode fwd", enc_fwd, (jnp.zeros(1), jnp.zeros(pcfg.out_dim)))

    def enc_fb(c):
        grads = jax.grad(lambda tb: jnp.vdot(
            packed_hash_encode(tb, x01, pcfg), g32))(table + c[0] * 0)
        return (grads[0, 0, :1] * 0, grads[0, 0])

    t("packed encode f+b", enc_fb, (jnp.zeros(1), jnp.zeros(pcfg.row_width)))

    # ---- MLPs in isolation ----
    enc_out = jax.random.normal(key, (B, pcfg.out_dim))
    gs = jax.random.normal(key, (B, 16))

    for cd in (jnp.bfloat16, jnp.float32):
        nm = "bf16" if cd == jnp.bfloat16 else "f32 "

        def sig_fb(c, cd=cd):
            ws = params["sigma_mlp"]

            def loss(ws):
                h = mlp_apply(ws, enc_out + c[0], compute_dtype=cd)
                return jnp.vdot(h, gs)

            gr = jax.grad(loss)(ws)
            return (gr[0][:1, 0] * 0, gr[0][0, 0])

        t(f"sigma MLP f+b {nm}", sig_fb, (jnp.zeros(1), jnp.zeros(())))

        rgb_in = jax.random.normal(key, (B, 16 + 16))
        g3 = jax.random.normal(key, (B, 3))

        def rgb_fb(c, cd=cd):
            ws = params["rgb_mlp"]

            def loss(ws):
                h = mlp_apply(ws, rgb_in + c[0], compute_dtype=cd)
                return jnp.vdot(h, g3)

            gr = jax.grad(loss)(ws)
            return (gr[0][:1, 0] * 0, gr[0][0, 0])

        t(f"rgb MLP f+b   {nm}", rgb_fb, (jnp.zeros(1), jnp.zeros(())))

    # ---- glue: sh4 + norm + sigmoid ----
    def glue_fb(c):
        def loss(d):
            du = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            e = sh_encode_deg4(du)
            return jnp.vdot(jax.nn.sigmoid(e @ jnp.ones((16, 3))), g32[:, :3])

        gr = jax.grad(loss)(d + c[0])
        return (gr[:1, 0] * 0, gr[0, 0])

    t("sh4+norm+sigmoid f+b", glue_fb, (jnp.zeros(1), jnp.zeros(())))

    # ---- full field ----
    xw = x01 - 0.5

    def field_fb(c):
        p = dict(params)
        p["packed_table"] = p["packed_table"] + c[0] * 0

        def loss(p):
            s, col = ngp_apply(p, cfg, xw, d)
            return jnp.sum(s) + jnp.vdot(col, g32[:, :3])

        gr = jax.grad(loss)(p)
        return (gr["packed_table"][0, 0, :1] * 0, gr["rgb_mlp"][0][0, 0])

    t("full ngp_apply f+b", field_fb, (jnp.zeros(1), jnp.zeros(())))
    print("DONE")


if __name__ == "__main__":
    main()
