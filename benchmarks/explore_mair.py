#!/usr/bin/env python
"""MaIR cost surgery: where do the 155ms @128 go, and what does a
segment-structured NSS gather cost vs plain row gather?"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tpuir_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def timeit(name, fn, x0, *rest, iters=10):
    @jax.jit
    def loop(x0, *rest):
        def body(i, carry):
            acc, x = carry
            y = fn(x, *rest)
            m = jnp.mean(y.astype(jnp.float32))
            return acc + m, x + (m * 1e-20).astype(x.dtype)

        return jax.lax.fori_loop(0, iters, body, (0.0, x0))[0]

    np.asarray(loop(x0, *rest))
    t0 = time.perf_counter()
    np.asarray(loop(x0, *rest))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:55s} {dt:9.3f} ms", flush=True)
    return dt


def main():
    np.asarray(jnp.ones((8, 8)))
    rng = np.random.RandomState(0)
    H = W = 128
    L, D = H * W, 234

    from tpuir.models.mair import scan_ids_for

    (sids_np, iids_np), _ = scan_ids_for(H, W, 4)
    sids = jnp.asarray(sids_np)
    iids = jnp.asarray(iids_np)
    xf = jnp.asarray(rng.rand(1, L, D), jnp.float32)

    which = set(sys.argv[1:]) or {"all"}

    if "all" in which or "gather" in which:
        timeit("plain take (4 dirs)", lambda q: jnp.take(q, sids, axis=1), xf)
        timeit(
            "plain inverse take_along_axis (4 dirs)",
            lambda q: jnp.take_along_axis(
                jnp.broadcast_to(q[:, None], (1, 4, L, D)), iids[None, :, :, None], axis=2
            ),
            xf,
        )
        # segment-structured gather: segments of scan_len=4 pixels.
        # dirs 0/1 are contiguous runs in row-major; dirs 2/3 in the
        # transposed layout (stripes along image columns).
        c = 4
        nseg = L // c

        def seg_table(ids_dir, transposed):
            flat = ids_dir
            if transposed:
                flat = (ids_dir % W) * H + ids_dir // W
            seg_of = flat.reshape(nseg, c)
            fwd = np.all(np.diff(seg_of, axis=1) == 1, axis=1)
            rev = np.all(np.diff(seg_of, axis=1) == -1, axis=1)
            assert np.all(fwd | rev), "segments are not contiguous runs"
            first = np.where(fwd, seg_of[:, 0], seg_of[:, -1])
            assert np.all(first % c == 0)
            return first // c, rev

        tabs = [seg_table(sids_np[k], k >= 2) for k in range(4)]
        seg_ids_j = jnp.asarray(np.stack([t[0] for t in tabs]))  # (4, nseg)
        rev_j = jnp.asarray(
            np.stack([t[1] for t in tabs])[:, :, None, None].astype(np.float32)
        )

        def seg_gather(q):  # q: (L, D)
            qt = q.reshape(H, W, D).transpose(1, 0, 2).reshape(L, D)
            segs = q.reshape(nseg, c, D)
            segs_t = qt.reshape(nseg, c, D)
            g01 = jnp.take(segs, seg_ids_j[:2], axis=0)
            g23 = jnp.take(segs_t, seg_ids_j[2:], axis=0)
            g = jnp.concatenate([g01, g23], axis=0)  # (4, nseg, c, D)
            return g * (1 - rev_j) + jnp.flip(g, axis=2) * rev_j

        # correctness
        want = np.asarray(jnp.take(xf[0], sids, axis=0))
        got = np.asarray(seg_gather(xf[0]).reshape(4, L, D))
        np.testing.assert_allclose(got, want)
        print("segment gather correct")
        timeit("segment gather (4 dirs)", lambda q: seg_gather(q[0]), xf)

    if "all" in which or "surgery" in which:
        os.environ["TPUIR_ALLOW_SURGERY"] = "1"  # benchmark-only opt-in
        os.environ["TPUIR_MAIR_SURGERY"] = ""
        from tpuir.models.mair import MaIR

        mair = MaIR()
        mp = mair.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
        xm = jnp.asarray(rng.rand(1, 128, 128, 3), jnp.float32)
        for mode in ("noscan", "nogather", "full"):
            os.environ["TPUIR_MAIR_SURGERY"] = mode if mode != "full" else ""
            try:
                timeit(f"mair f32 parity @128 [{mode}]",
                       lambda q, p: mair.apply(p, q), xm, mp)
            except Exception as e:
                print(f"{mode} failed: {type(e).__name__}: {str(e)[:150]}")


if __name__ == "__main__":
    main()
