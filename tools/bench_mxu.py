#!/usr/bin/env python
"""On-chip sizing of the MXU brute-force intersector (VERDICT r4 #1).

Moller-Trumbore's det / u*det / v*det / t*det are bilinear in (o, d), so a
(R, 16) ray-feature matrix @ a per-scene (16, 4T) coefficient matrix tests
EVERY (ray, triangle) pair on the MXU — the question is whether that beats
the measured packet traversal for incoherent rays (~50-105 ms per 262k-ray
dispatch on helmet). The arithmetic says no on two counts this tool
measures directly:

  1. K-utilization: the MXU contracts over 128 rows; the MT encoding has
     K=16, so the systolic array runs at ~16/128 = 12.5% utilization.
     Measured here as effective Tflop/s vs K at fixed output shape.
  2. VPU epilogue: the hit predicate + winner reduction costs ~13-19
     elementwise ops per (ray, tri) pair — at 262k x 48k pairs that is
     ~1.3e10 pairs, more expensive than the matmul itself.

Both are combined in a REAL brute-force closest-hit Pallas kernel (grid
over 1024-ray blocks, coefficient slabs VMEM-resident, running-min with a
bitcast key so the (R, T) matrix never materializes), correctness-checked
against numpy MT in interpret mode, then timed at helmet (48k tris) and
courtyard (274k tris) table widths. Compare the printed per-262k-chunk
cost against the packet kernel rows in CHIP_QUEUE_RESULTS / the ledger.

Run on the TPU. Pipelined timing per docs/PERFORMANCE.md.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

RB = 1024   # rays per grid block
TB = 512    # triangles per inner step


def timeit_pipe(fn, *args, k=8, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(k):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / k * 1e3  # ms


def k_utilization_curve():
    """Effective bf16 Tflop/s of dot((R,K),(K,N)) vs contraction depth K."""
    import jax
    import jax.numpy as jnp

    R, N = 32768, 2048
    print("--- MXU K-utilization (bf16, f32 accum), R=32768 N=2048 ---")
    for K in (16, 32, 64, 128, 256, 512):
        a = jnp.ones((R, K), jnp.bfloat16)
        b = jnp.ones((K, N), jnp.bfloat16)
        f = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        ms = timeit_pipe(f, a, b, k=16)
        tf = 2 * R * K * N / (ms * 1e-3) / 1e12
        print(f"  K={K:4d}: {ms:7.3f} ms  -> {tf:6.1f} Tflop/s effective")


def mt_coefficients(v0, e1, e2):
    """(16, T) coefficient slabs for det, u*det, v*det, t*det (feature
    order: o(3), d(3), d_i*o_k(9), 1 — matches _proxy_occlusion,
    render/pathtracer.py)."""
    t = v0.shape[0]
    n = np.cross(e1, e2)

    def skew_flat(a):  # rows 6:15 coefficient of d.(a x o) as d_i*o_k
        z = np.zeros(t)
        # d.(a x o) = sum_ik d_i o_k (skew(a))_ik, skew(a) @ x = a x x
        s = np.stack([
            np.stack([z, -a[:, 2], a[:, 1]], 1),
            np.stack([a[:, 2], z, -a[:, 0]], 1),
            np.stack([-a[:, 1], a[:, 0], z], 1),
        ], 1)  # (T, 3, 3) i index then k
        return s.reshape(t, 9).T  # (9, T)

    c_det = np.zeros((16, t), np.float32)
    c_det[3:6] = -n.T
    c_ud = np.zeros((16, t), np.float32)
    c_ud[3:6] = -np.cross(e2, v0).T
    c_ud[6:15] = skew_flat(e2)
    c_vd = np.zeros((16, t), np.float32)
    c_vd[3:6] = -np.cross(v0, e1).T
    c_vd[6:15] = -skew_flat(e1)
    c_td = np.zeros((16, t), np.float32)
    c_td[0:3] = n.T
    c_td[15] = -np.sum(v0 * n, -1)
    return c_det, c_ud, c_vd, c_td


def ray_features(o, d):
    return np.concatenate(
        [o, d, (d[:, :, None] * o[:, None, :]).reshape(-1, 9),
         np.ones((o.shape[0], 1), np.float32)], -1)


def make_brute_kernel(t_pad, interpret=False):
    """Brute-force closest hit: returns per-ray packed winner key
    (bitcast(t) & ~0x1ff | block_lane) and winning T-block id."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_tb = t_pad // TB
    BIG = 0x7F7FFFFF  # +inf-ish f32 bit pattern, top of the int order

    def kernel(f_ref, tmin_ref, tmax_ref, cdet_ref, cud_ref, cvd_ref,
               ctd_ref, key_ref, blk_ref):
        f = f_ref[:, :]                       # (RB, 16) bf16
        tmin = tmin_ref[:, :]                 # (RB, 1) f32
        tmax = tmax_ref[:, :]

        def step(j, carry):
            rkey, rblk = carry
            sl = pl.dslice(j * TB, TB)

            def mm(ref):
                return jax.lax.dot_general(
                    f, ref[:, sl], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            det = mm(cdet_ref)                # (RB, TB) f32
            ud = mm(cud_ref)
            vd = mm(cvd_ref)
            td = mm(ctd_ref)
            m3 = det - ud - vd
            m4 = td - tmin * det
            m5 = tmax * det - td
            a = jnp.minimum(jnp.minimum(ud, vd),
                            jnp.minimum(m3, jnp.minimum(m4, m5)))
            b = jnp.maximum(jnp.maximum(ud, vd),
                            jnp.maximum(m3, jnp.maximum(m4, m5)))
            hit = ((det > 0) & (a >= 0)) | ((det < 0) & (b <= 0))
            t = td / det
            tb = jnp.where(hit, t, jnp.float32(np.inf))
            lane = jax.lax.broadcasted_iota(jnp.int32, (RB, TB), 1)
            key = (jax.lax.bitcast_convert_type(tb, jnp.int32)
                   & jnp.int32(~0x1FF)) | lane
            kmin = jnp.min(key, axis=1, keepdims=True)      # (RB, 1)
            better = kmin < rkey
            return (jnp.where(better, kmin, rkey),
                    jnp.where(better, jnp.full_like(rblk, j), rblk))

        init = (jnp.full((RB, 1), BIG, jnp.int32),
                jnp.full((RB, 1), -1, jnp.int32))
        rkey, rblk = jax.lax.fori_loop(0, n_tb, step, init)
        key_ref[:, :] = rkey
        blk_ref[:, :] = rblk

    def run(feats, tmin, tmax, cdet, cud, cvd, ctd):
        r = feats.shape[0]
        grid = r // RB
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((RB, 16), lambda i: (i, 0)),
                pl.BlockSpec((RB, 1), lambda i: (i, 0)),
                pl.BlockSpec((RB, 1), lambda i: (i, 0)),
                pl.BlockSpec((16, t_pad), lambda i: (0, 0)),
                pl.BlockSpec((16, t_pad), lambda i: (0, 0)),
                pl.BlockSpec((16, t_pad), lambda i: (0, 0)),
                pl.BlockSpec((16, t_pad), lambda i: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((RB, 1), lambda i: (i, 0)),
                pl.BlockSpec((RB, 1), lambda i: (i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((r, 1), jnp.int32),
                jax.ShapeDtypeStruct((r, 1), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(feats, tmin, tmax, cdet, cud, cvd, ctd)

    return run


def decode_winner(key, blk):
    """(t approx, global tri id or -1) from the packed outputs."""
    key = np.asarray(key)[:, 0]
    blk = np.asarray(blk)[:, 0]
    lane = key & 0x1FF
    tbits = key & ~0x1FF
    t = np.frombuffer(tbits.astype(np.int32).tobytes(), np.float32)
    miss = ~np.isfinite(t)
    tri = np.where(miss, -1, blk * TB + lane)
    return t, tri


def brute_reference(o, d, tmin, tmax, v0, e1, e2):
    """Exact numpy MT closest hit (small scales only): d.(a x o) terms via
    the cross-product identity d.(a x o) = a.(o x d)."""
    n = np.cross(e1, e2)
    oxd = np.cross(o[:, None, :], d[:, None, :])[:, 0, :]  # (R, 3)
    det = -np.einsum("rk,tk->rt", d, n)
    ud = (np.einsum("rk,tk->rt", oxd, e2)
          - np.einsum("rk,tk->rt", d, np.cross(e2, v0)))
    vd = (-np.einsum("rk,tk->rt", oxd, e1)
          - np.einsum("rk,tk->rt", d, np.cross(v0, e1)))
    td = np.einsum("rk,tk->rt", o, n) - (v0 * n).sum(-1)[None, :]
    s = np.sign(det)
    us, vs, ts, ad = ud * s, vd * s, td * s, np.abs(det)
    hit = ((ad > 0) & (us >= 0) & (vs >= 0) & (us + vs <= ad)
           & (ts >= tmin[:, None] * ad) & (ts <= tmax[:, None] * ad))
    t = np.where(hit, td / np.where(det == 0, 1, det), np.inf)
    best = t.argmin(1)
    tbest = t[np.arange(len(o)), best]
    return np.where(np.isfinite(tbest), tbest, np.inf), np.where(
        np.isfinite(tbest), best, -1)


def correctness_check():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    T = 2 * TB
    v0 = rng.normal(size=(T, 3)).astype(np.float32)
    e1 = rng.normal(size=(T, 3)).astype(np.float32) * 0.3
    e2 = rng.normal(size=(T, 3)).astype(np.float32) * 0.3
    o = rng.normal(size=(RB, 3)).astype(np.float32) * 2
    d = rng.normal(size=(RB, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmin = np.zeros(RB, np.float32)
    tmax = np.full(RB, 100.0, np.float32)

    cs = [jnp.asarray(c, jnp.bfloat16) for c in mt_coefficients(v0, e1, e2)]
    feats = jnp.asarray(ray_features(o, d), jnp.bfloat16)
    run = make_brute_kernel(T, interpret=jax.default_backend() == "cpu")
    key, blk = run(feats, jnp.asarray(tmin)[:, None], jnp.asarray(tmax)[:, None], *cs)
    t_k, tri_k = decode_winner(key, blk)
    t_r, tri_r = brute_reference(o, d, tmin, tmax, v0, e1, e2)

    both_hit = (tri_k >= 0) & (tri_r >= 0)
    agree = tri_k == tri_r
    miss_agree = (tri_k < 0) == (tri_r < 0)
    rel = np.abs(t_k[both_hit & agree] - t_r[both_hit & agree]) / np.maximum(
        t_r[both_hit & agree], 1e-6)
    print(f"correctness: {miss_agree.mean() * 100:.2f}% hit/miss agreement, "
          f"{agree[both_hit].mean() * 100:.2f}% same winner, "
          f"max rel t err {rel.max() if rel.size else 0:.2e} "
          f"(bf16 features: small disagreement at grazing edges expected; "
          f"exact narrowphase would retest winners)")
    assert miss_agree.mean() > 0.97
    return True


def scale_timing():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    R = 262144
    o = rng.normal(size=(R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    feats = jnp.asarray(ray_features(o, d), jnp.bfloat16)
    tmin = jnp.zeros((R, 1), jnp.float32)
    tmax = jnp.full((R, 1), 100.0, jnp.float32)

    for t_real, name in ((48768, "helmet"), (274432, "courtyard")):
        t_pad = -(-t_real // TB) * TB
        vmem_mb = 4 * 16 * t_pad * 2 / 2**20
        v0 = rng.normal(size=(t_pad, 3)).astype(np.float32)
        e1 = rng.normal(size=(t_pad, 3)).astype(np.float32) * 0.1
        e2 = rng.normal(size=(t_pad, 3)).astype(np.float32) * 0.1
        cs = [jnp.asarray(c, jnp.bfloat16) for c in mt_coefficients(v0, e1, e2)]
        run = make_brute_kernel(t_pad)
        try:
            ms = timeit_pipe(run, feats, tmin, tmax, *cs, k=4)
        except Exception as e:
            print(f"{name} (T={t_pad}, C tables {vmem_mb:.1f} MB VMEM): "
                  f"FAILED: {str(e)[:200]}")
            continue
        pairs = R * t_pad
        print(f"{name} (T={t_pad}, C {vmem_mb:.1f} MB): {ms:8.1f} ms per "
              f"262k-ray chunk = {ms / R * 1e6:.0f} ns/ray "
              f"({pairs / (ms * 1e-3) / 1e12:.2f} Tpairs/s)")


def main():
    import jax

    print(f"backend: {jax.default_backend()}")
    if jax.default_backend() == "cpu":
        correctness_check()
        print("(CPU: correctness only; run on the TPU for timings)")
        return
    # honest-mode: one pallas dispatch before timing (docs/PERFORMANCE.md)
    import bench
    bench._warm_pallas()
    correctness_check()
    k_utilization_curve()
    scale_timing()


if __name__ == "__main__":
    main()
