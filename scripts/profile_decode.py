"""Per-component decode-step profile at serving shapes.

The 64-step beam decode is ~34.5 ms/step at batch 48 (r3), an estimated
4-5x its HBM roofline; device traces are unavailable through the axon
tunnel, so this measures each component of one decode step in isolation —
jitted R-iteration loops with a carried data dependence (the remote layer
caches bit-identical dispatches) and a host readback as the only reliable
timing barrier.

Run ON THE REAL TPU with nothing else on the host:
    python scripts/profile_decode.py [--rows 240] [--repeat 20]

Components (shapes mirror bench.py serving: batch 48 x beam 5 = 240 rows,
LLaMA-3.2-3B 28L/3072, GQA 24/8/128, prompt 130, gen 64, vocab 128256):
  trunk      - the 7 int8 projections per layer x 28 (q/k/v/o + mlp)
  attention  - split-cache attention (prompt + gen einsums, softmax) x 28
  unembed    - int8 [rows, 3072] x [3072, 128256]
  topk       - beam_topk over [B, K, V]
  gather     - Pallas beam reorder of the 56 gen-KV leaves
  rmsnorm    - 57 RMSNorm applications (2/layer + final)
"""
import argparse
import time

import numpy as np


def sync(x):
    import jax

    return np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[:8]))


def bench(name, fn, *args, repeats=3):
    import jax

    fn = jax.jit(fn)
    out = fn(*args)
    sync(out)  # compile + first run
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        times.append(time.perf_counter() - t0)
    return name, min(times)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=240)
    p.add_argument("--batch", type=int, default=48)
    p.add_argument("--beams", type=int, default=5)
    p.add_argument("--repeat", type=int, default=10, help="loop iterations inside jit")
    p.add_argument("--only", default=None,
                   help="comma list of components (trunk,attention,unembed,topk,gather,rmsnorm); "
                   "remote compiles through the tunnel cost 3-8 min EACH — run incrementally")
    p.add_argument("--layers", type=int, default=28)
    p.add_argument("--prompt", type=int, default=130)
    p.add_argument("--gen", type=int, default=64)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodalvc_tpu.ops.int8_matmul import int8_matmul, quantize_kernel

    jax.config.update("jax_compilation_cache_dir", "/tmp/mmvc_jax_cache")

    rows, L, Tp, Lg = args.rows, args.layers, args.prompt, args.gen
    b, k = args.batch, args.beams
    d, inter, hd, h, g = 3072, 8192, 128, 24, 8
    rep = h // g
    V = 128256
    R = args.repeat
    key = jax.random.PRNGKey(0)

    def qw(shape, seed):
        w = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.bfloat16) * 0.02
        return quantize_kernel(w)

    x0 = jax.random.normal(key, (rows, d), jnp.bfloat16)

    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    results = []

    # ---- trunk int8 matmuls ------------------------------------------------
    if not want("trunk"):
        wq = wk = wv = wo = wg_ = wu = wd = None
    else:
        wq = qw((d, h * hd), 1)
        wk = qw((d, g * hd), 2)
        wv = qw((d, g * hd), 3)
        wo = qw((h * hd, d), 4)
        wg_ = qw((d, inter), 5)
        wu = qw((d, inter), 6)
        wd = qw((inter, d), 7)

    def trunk(x):
        def layer(x, _):
            q = int8_matmul(x, *wq)
            kk = int8_matmul(x, *wk)
            vv = int8_matmul(x, *wv)
            o = int8_matmul(q, *wo)
            gate = jax.nn.silu(int8_matmul(x, *wg_).astype(jnp.float32)).astype(x.dtype)
            up = int8_matmul(x, *wu)
            down = int8_matmul((gate * up), *wd)
            nxt = (o + down + kk.sum() * 0 + vv.sum() * 0).astype(x.dtype)
            return nxt * jax.lax.rsqrt(jnp.float32(d)).astype(x.dtype), None

        def step(x, _):
            x, _ = jax.lax.scan(layer, x, None, length=L)
            return x, None

        return jax.lax.scan(step, x, None, length=R)[0]

    if want("trunk"):
        results.append(bench("trunk(qkvo+mlp int8, 28L)", trunk, x0))

    # ---- attention (split cache) --------------------------------------------
    pk = jax.random.normal(key, (b, g, Tp, hd), jnp.bfloat16)
    pv = pk + 1
    gk = jax.random.normal(key, (rows, Lg, g, hd), jnp.bfloat16)
    gv = gk + 1
    pmask = jnp.ones((b, Tp), bool)
    q0 = jax.random.normal(key, (rows, h, 1, hd), jnp.bfloat16)

    def attention(q):
        scale = 1.0 / np.sqrt(hd)

        def one(q, _):
            q_r = q.reshape(b, k, g, rep, 1, hd)
            s_p = jnp.einsum("bkgrtd,bgpd->bkgrtp", q_r, pk, preferred_element_type=jnp.float32) * scale
            s_p = jnp.where(pmask[:, None, None, None, None, :], s_p, -1e30).reshape(rows, h, 1, Tp)
            q_g = q.reshape(rows, g, rep, 1, hd)
            s_g = jnp.einsum("Bgrtd,Blgd->Bgrtl", q_g, gk, preferred_element_type=jnp.float32) * scale
            s_g = s_g.reshape(rows, h, 1, Lg)
            w = jax.nn.softmax(jnp.concatenate([s_p, s_g], -1), axis=-1)
            w_p, w_g = w[..., :Tp], w[..., Tp:]
            out_p = jnp.einsum(
                "bkgrtp,bgpd->bkgrtd", w_p.reshape(b, k, g, rep, 1, Tp).astype(jnp.bfloat16), pv
            ).reshape(rows, h, 1, hd)
            out_g = jnp.einsum(
                "Bgrtl,Blgd->Bgrtd", w_g.reshape(rows, g, rep, 1, Lg).astype(jnp.bfloat16), gv
            ).reshape(rows, h, 1, hd)
            o = out_p + out_g
            return q + o * 1e-6, None

        def step(q, _):
            q, _ = jax.lax.scan(one, q, None, length=L)
            return q, None

        return jax.lax.scan(step, q, None, length=R)[0]

    if want("attention"):
        results.append(bench("attention(split-cache, 28L)", attention, q0))

    # ---- unembed -------------------------------------------------------------
    wemb = qw((d, V), 8) if want("unembed") else None

    def unembed(x):
        def step(x, _):
            lg = int8_matmul(x, *wemb)
            return x + lg[:, :d].astype(x.dtype) * 1e-6, None

        return jax.lax.scan(step, x, None, length=R)[0]

    if want("unembed"):
        results.append(bench("unembed(int8, 3072x128256)", unembed, x0))

    # ---- topk ----------------------------------------------------------------
    logp0 = jax.random.normal(key, (b, k, V), jnp.float32)
    scores0 = jnp.zeros((b, k), jnp.float32)

    def topk(logp):
        from multimodalvc_tpu.ops.topk import beam_topk

        def step(lp, _):
            v_, i_ = beam_topk(lp, scores0, 2 * k)
            lp = lp + v_.sum() * 1e-9
            return lp, None

        return jax.lax.scan(step, logp, None, length=R)[0]

    if want("topk"):
        results.append(bench("topk(beam_topk 2K)", topk, logp0))

    # ---- gather (56 gen leaves) ----------------------------------------------
    from multimodalvc_tpu.ops.beam_gather import gather_beams_rows

    leaves0 = [gk + i for i in range(2 * L)]
    idx0 = jnp.tile(jnp.asarray([[1, 0, 2, 4, 3]], jnp.int32), (b, 1))

    def gather(leaves):
        def step(ls, _):
            out = [gather_beams_rows(x, idx0, b, k) for x in ls]
            return out, None

        return jax.lax.scan(step, leaves, None, length=R)[0]

    if want("gather"):
        results.append(bench("gather(56 gen-KV leaves)", gather, leaves0))

    # ---- rmsnorm x 57 ---------------------------------------------------------
    scale0 = jnp.ones((d,), jnp.float32)

    def rmsnorm(x):
        def one(x, _):
            v = x.astype(jnp.float32)
            y = v * jax.lax.rsqrt(jnp.mean(v * v, -1, keepdims=True) + 1e-5) * scale0
            return y.astype(x.dtype), None

        def step(x, _):
            x, _ = jax.lax.scan(one, x, None, length=2 * L + 1)
            return x, None

        return jax.lax.scan(step, x, None, length=R)[0]

    if want("rmsnorm"):
        results.append(bench("rmsnorm(57x)", rmsnorm, x0))

    print(f"\n== decode components (ms per decode step, R={R}) ==")
    total = 0.0
    for name, t in results:
        ms = t / R * 1e3
        total += ms
        print(f"{name:36s} {ms:8.3f} ms")
    print(f"{'SUM':36s} {total:8.3f} ms  (r3 full step: ~34.5 ms)")


if __name__ == "__main__":
    main()
